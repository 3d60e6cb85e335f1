"""Block segmentation + segment classification.

Reference analog: region proposal (`proposals/connected_components.py:96-220`),
the Attentive-RCNN detector emitting a descending (score, cls) list per
region (`detection/src/torch_model/inference/inference.py:44-55`), the
XGBoost postprocessor (`postprocess/xgboost_model/inference.py:12-26`) and
the regex rules postprocessor (`postprocess/pp_rules.py:7-35`).

Our web-page analog: the extract stage already produced typed blocks in
reading order (the DOM *is* the layout); this module

1. ``explode_segments`` — fan-out 1 page -> N segment rows with synthetic
   layout bboxes and page numbers (``flat_map`` semantics done as a
   vectorized ``map_batches`` that returns more rows than it receives,
   reference analog `ingest/ingest.py:172-200` row explode), and
2. ``SegmentClassifier`` — an **actor-pool** ``map_batches`` stage: state
   (compiled regexes, class priors, feature weights) built once per actor
   in ``__init__``, per-batch scoring in ``__call__``. Emits the
   reference's ranked (score, cls) list contract plus argmax cls/score,
   then applies the caption rules pass (score := 1.0 override).

Whole-page context (D2 parity, `postprocess/xgboost_model/featurizer.py:84-125`):
the reference scores each region with up to 15 neighbor classes found by
IoU on expanded boxes. Here ``SegmentClassifier`` applies the same
neighbor featurization inside each batch: ``explode_segments`` emits every
url's segments as one contiguous run within its output block, and the
classifier keeps ``batch_size=None`` (one batch per block), so each batch
contains whole url-groups — the page-grouped-batches requirement is an
invariant of the chain, not a shuffle. Neighbor classes then drive
deterministic context rules (isolated-table-cell demotion, unknown-class
smoothing) standing in for the learned XGBoost behavior.

Determinism: per-row features plus within-url neighbor features only, so
class output is independent of batch boundaries as long as url runs are
not split (guaranteed by the block-per-batch invariant above).
"""

from __future__ import annotations

import collections
import re

import numpy as np
import pyarrow as pa

CLASSES = [
    "Title",
    "Section Header",
    "Body Text",
    "List Item",
    "Table",
    "Table Caption",
    "Figure Caption",
    "Equation",
    "Other",
]

# synthetic layout constants (1920-px page space like the reference,
# `connected_components.py:184,207`)
_PAGE_H = 1920.0
_LINE_H = 24.0
_BLOCKS_PER_PAGE = 12
_X0 = 72.0

SEGMENTS_UNCLASSIFIED = pa.schema(
    [
        ("url", pa.string()),
        ("page_num", pa.int32()),
        ("seg_id", pa.int32()),
        ("tag", pa.string()),
        ("text", pa.string()),
        ("bbox", pa.list_(pa.float32(), 4)),
    ]
)


# two-column layout constants: a deterministic ~1/3 of pages render as
# two 816-px columns split at x=960 — the reference's golden documents
# are two-column by default (`cosmos_service/test/src/annotations/
# annotations_base.py:16-133`), so the synthetic corpus plants the same
# layout class. All coordinates stay integer-valued float32 (SQL-parity
# invariant, see queries/oracle_gen.py).
_COL_SPLIT_X = 960.0
_COL_W = 816.0          # column text width cap (x2 <= x1 + 816 < split)
_TWOCOL_ROWS = 6        # 12 blocks -> 2 columns x 6 rows
_TWOCOL_PITCH = 296.0   # 2x the single-column 148-px line pitch
_LAYOUT_DRAW_K = 97     # layout draw key (clear of the fact keys 10..62)
_H_MOD = 1048573        # pages._h modulus (generator parity)

_DID_RE = re.compile(r"/p/(\d+)")


def did_of_url(url: str) -> int:
    """Stable per-document integer for the layout draw: the trailing
    ``/p/<id>`` of corpus urls (the generator's doc id — what the SQL
    oracles key their ``_H`` draws on); byte-sum fallback for foreign
    urls (the draw only needs determinism, not any particular value)."""
    m = _DID_RE.search(url)
    if m is not None:
        return int(m.group(1))
    return sum(url.encode()) % _H_MOD


def layout_twocol_mask(dids: np.ndarray, seg_id: np.ndarray,
                       td_mask: np.ndarray,
                       pre_mask: np.ndarray | None = None) -> np.ndarray:
    """Per-row bool: does this row's page render two-column?

    Draw: ``pages._h(did, 97 + page) % 3 == 0`` (~1/3 of pages,
    SQL-replayable integer arithmetic). VETOED for pages where an
    unbreakable float would straddle the column break or the page edge —
    real typesetting never splits a table across columns, and a display
    equation keeps its label line adjacent:

    - td at pos 5 AND pos 6 (table-cell run crosses the break), or
      td at pos 11 (run could depend on cross-page adjacency);
    - pre at pos 5 (its label at pos 6 would land in the other column)
      or pre at pos 11 (label on the next page leaves the 300-px
      midline window once this page reflows).

    The veto also preserves the page-context demotion rule's no-op
    invariant on the synthetic corpus (every td keeps a same-column td
    neighbor)."""
    page = (seg_id // _BLOCKS_PER_PAGE).astype(np.int64)
    pos = (seg_id % _BLOCKS_PER_PAGE).astype(np.int64)
    did = dids.astype(np.int64)
    k = _LAYOUT_DRAW_K + page
    h = (did * 1000003 + k * 10007 + did * k * 7919 + 12345) % _H_MOD
    draw = (h % 3) == 0
    key = did * (1 << 22) + page
    uk, ginv = np.unique(key, return_inverse=True)

    def flag(mask: np.ndarray) -> np.ndarray:
        f = np.zeros(len(uk), dtype=bool)
        np.logical_or.at(f, ginv[mask], True)
        return f

    td = np.asarray(td_mask, dtype=bool)
    last = _BLOCKS_PER_PAGE - 1
    veto = (flag(td & (pos == 5)) & flag(td & (pos == 6))) | flag(td & (pos == last))
    if pre_mask is not None:
        pre = np.asarray(pre_mask, dtype=bool)
        veto |= flag(pre & ((pos == 5) | (pos == last)))
    return draw & ~veto[ginv]


def synthetic_bboxes(seg_id: np.ndarray, text_lens: np.ndarray,
                     twocol: np.ndarray | None = None) -> np.ndarray:
    """(N,) seg ids + text lengths (+ per-row two-column page flag) ->
    (N, 4) float32 layout boxes: the deterministic 1920-px synthetic
    page layout. Single-column pages stack 12 lines at 148-px pitch;
    two-column pages place positions 0-5 in the left column and 6-11 in
    the right (x1 = 72 / 1032, 296-px row pitch) — reading order is
    column-major, so a plain (page, y, x) sort interleaves the columns
    and only the column-aware order (x // 960 bin first) reconstructs
    it. Single source of truth shared by the explode stage and the
    golden annotations in ``stages/metrics.py``."""
    pos = (seg_id % _BLOCKS_PER_PAGE).astype(np.float32)
    if twocol is None:
        twocol = np.zeros(len(seg_id), dtype=bool)
    y1 = np.where(
        twocol,
        72.0 + (pos % _TWOCOL_ROWS) * _TWOCOL_PITCH,
        72.0 + pos * ((_PAGE_H - 144.0) / _BLOCKS_PER_PAGE),
    ).astype(np.float32)
    y2 = y1 + np.float32(_LINE_H)
    x1 = np.where(
        twocol, _X0 + (pos // _TWOCOL_ROWS) * _COL_SPLIT_X, _X0
    ).astype(np.float32)
    x2 = np.minimum(
        x1 + 6.0 * text_lens, np.where(twocol, x1 + _COL_W, 1848.0)
    ).astype(np.float32)
    return np.stack([x1, y1, x2, y2], axis=1)


def _lonely_table_demotions(gy1: np.ndarray, gy2: np.ndarray,
                            gx1: np.ndarray, gx2: np.ndarray,
                            table_like: np.ndarray,
                            tab_idx: np.ndarray) -> np.ndarray:
    """Exact demotion set for the lonely-table rule, vectorized: a Table
    row with >=1 expanded-overlap neighbor but none of class Table /
    Table Caption. Inputs must be SORTED by gy1 with per-url-group y
    offsets already applied (so y windows never cross groups); x is raw
    page space. Neighbor = expanded boxes overlap in BOTH axes — the
    two-column layout makes the x check load-bearing (the old prefix-sum
    shortcut assumed single-column pages, where x always overlaps).
    Matches the exact per-group path including the _MAX_NEIGHBORS
    nearest-by-center cap (refined row-wise only for the rare rows where
    the cap binds). Returns indices (in the sorted frame) to demote."""
    if len(tab_idx) == 0:
        return tab_idx
    E2 = 2.0 * _CTX_EXPAND
    n = len(gy1)
    gy2max = np.maximum.accumulate(gy2)
    up = np.searchsorted(gy1, gy2[tab_idx] + E2, side="left")
    dn = np.searchsorted(gy2max, gy1[tab_idx] - E2, side="right")
    W = int((up - dn).max())
    if W <= 0:
        return np.empty(0, dtype=np.int64)
    cols = dn[:, None] + np.arange(W)[None, :]
    valid = cols < up[:, None]
    cols = np.minimum(cols, n - 1)
    ti = tab_idx[:, None]
    xok = (gx1[cols] < gx2[ti] + E2) & (gx1[ti] < gx2[cols] + E2)
    yok = (gy2[cols] > gy1[ti] - E2) & (gy1[cols] < gy2[ti] + E2)
    nb = valid & (cols != ti) & xok & yok
    cnt = nb.sum(axis=1)
    has_tab = (nb & table_like[cols]).any(axis=1)
    demote = (cnt >= 1) & ~has_tab
    over = np.flatnonzero(cnt > _MAX_NEIGHBORS)
    if len(over):
        centers = (gy1 + gy2) / 2.0
        for oi in over:
            js = cols[oi][nb[oi]]
            near = js[np.argsort(np.abs(centers[js] - centers[tab_idx[oi]]),
                                 kind="stable")[:_MAX_NEIGHBORS]]
            demote[oi] = not table_like[near].any()
    return tab_idx[demote]


def explode_segments(batch: pa.Table) -> pa.Table:
    """EXTRACTED batch -> one row per block. Builds offsets vectorized
    from the ``n_blocks`` column; the nested blocks column is flattened
    zero-copy via its underlying ListArray values."""
    n_blocks = batch.column("n_blocks").to_numpy(zero_copy_only=False).astype(np.int64)
    total = int(n_blocks.sum())
    if total == 0:
        return SEGMENTS_UNCLASSIFIED.empty_table()

    # repeat parent columns by n_blocks
    parent_idx = np.repeat(np.arange(len(n_blocks)), n_blocks)
    urls = batch.column("url").take(pa.array(parent_idx))

    blocks = batch.column("blocks")
    flat = blocks.combine_chunks() if isinstance(blocks, pa.ChunkedArray) else blocks
    if isinstance(flat, pa.ChunkedArray):  # single chunk after combine
        flat = flat.chunk(0)
    values = flat.flatten()  # StructArray of (tag, text), len == total
    tags = values.field("tag")
    texts = values.field("text")

    # seg_id = position within its page row
    seg_id = np.concatenate([np.arange(k, dtype=np.int32) for k in n_blocks]) if total else np.array([], np.int32)
    page_num = (seg_id // _BLOCKS_PER_PAGE).astype(np.int32)

    import pyarrow.compute as pc

    lens = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.float32)
    pdids = np.array([did_of_url(u) for u in batch.column("url").to_pylist()],
                     dtype=np.int64)  # one parse per PARENT row, not per block
    td_mask = pc.equal(tags, pa.scalar("td")).to_numpy(zero_copy_only=False)
    pre_mask = pc.equal(tags, pa.scalar("pre")).to_numpy(zero_copy_only=False)
    twocol = layout_twocol_mask(pdids[parent_idx], seg_id.astype(np.int64),
                                td_mask, pre_mask)
    boxes = synthetic_bboxes(seg_id, lens, twocol)
    bbox = pa.FixedSizeListArray.from_arrays(
        pa.array(boxes.reshape(-1), pa.float32()), 4
    )

    return pa.table(
        {
            "url": urls,
            "page_num": pa.array(page_num, pa.int32()),
            "seg_id": pa.array(seg_id, pa.int32()),
            "tag": tags,
            "text": texts,
            "bbox": bbox,
        },
        schema=SEGMENTS_UNCLASSIFIED,
    )


# Whole-page-context constants (featurizer parity):
# the reference expands each box by 50 px at 1920-px page scale and takes
# IoU>0 neighbors (`featurizer.py:16-26`), capped at the 15 nearest
# (`featurizer.py:85,99-102`). Our synthetic layout stacks lines 148 px
# apart, so the expansion is scaled to make reading-order +-2 neighbors
# (and +-1 across a page boundary) overlap — same neighborhood *shape*
# relative to line pitch as the reference's relative to text size.
_CTX_EXPAND = 140.0
_MAX_NEIGHBORS = 15


class SegmentClassifier:
    """Actor-pool classifier: ranked (score, cls) list per segment +
    rules postprocess + whole-page-context postprocess. Pass to
    ``ds.map_batches(SegmentClassifier, concurrency=N, batch_size=None,
    batch_format="pyarrow")`` (``batch_size=None`` preserves the
    whole-url-runs-per-batch invariant the context pass needs).

    A deterministic featurized scorer stands in for the reference's
    RCNN+XGBoost stack (no torch in this container); the *contract* —
    per-segment descending class ranking, postprocessed argmax with
    <=15-IoU-neighbor page context (`featurizer.py:84-125`), caption
    rules override with score 1.0 (`pp_rules.py:30-34`) — is identical.
    """

    # feature weights: (tag prior, caps-start, ends-period, short, long)
    _TAG_PRIOR = {
        "h1": "Title",
        "h2": "Section Header",
        "h3": "Section Header",
        "h4": "Section Header",
        "p": "Body Text",
        "blockquote": "Body Text",
        "pre": "Equation",
        "li": "List Item",
        "td": "Table",
        "th": "Table",
        "caption": "Table Caption",
        "figcaption": "Figure Caption",
    }

    def __init__(self, page_context: bool = True, emit_neighbors: bool = False) -> None:
        self.page_context = page_context
        self.emit_neighbors = emit_neighbors
        # once per actor: compile rules (reference: models loaded in
        # worker plugins, `preload_plugins/detect_setup.py:6-15`) and
        # precompute the ranked score table over the small feature space
        # (prior-class x ends-period x short). Per-batch work is then a
        # single vectorized ``take`` per output column against these
        # combo arrays — no per-row python list construction.
        self.re_table_cap = re.compile(r"^(table|tbl|tab)\.? ?[0-9]", re.I)
        self.re_figure_cap = re.compile(r"^(figure|fig|scheme|plate)\.? ?[0-9]", re.I)
        self._combo_classes: list[list[str]] = []
        self._combo_scores: list[list[float]] = []
        self._combo_of: dict[tuple[str, bool, bool], int] = {}
        for prior in CLASSES:
            for endsp in (False, True):
                for short in (False, True):
                    ranked = self._score_combo(prior, endsp, short)
                    self._combo_of[(prior, endsp, short)] = len(self._combo_classes)
                    self._combo_classes.append([c for _, c in ranked])
                    self._combo_scores.append([s for s, _ in ranked])
        # vectorized lookup state: combo id = prior_class_idx * 4 +
        # ends_period * 2 + short (matches the loop order above)
        self._tag_keys = pa.array(list(self._TAG_PRIOR.keys()), pa.string())
        other_idx = CLASSES.index("Other")
        self._tag_prior_idx = np.array(
            [CLASSES.index(v) for v in self._TAG_PRIOR.values()] + [other_idx],
            dtype=np.int64,
        )
        self._combo_classes_arr = pa.array(self._combo_classes, pa.list_(pa.string()))
        self._combo_scores_arr = pa.array(self._combo_scores, pa.list_(pa.float32()))
        self._combo_top_cls = pa.array([c[0] for c in self._combo_classes], pa.string())
        self._combo_top_score = pa.array(
            [s[0] for s in self._combo_scores], pa.float32()
        )

    @staticmethod
    def _score_combo(prior: str, ends_period: bool, short: bool) -> list[tuple[float, str]]:
        base = {c: 0.05 for c in CLASSES}
        base[prior] = 0.75
        if ends_period and prior in ("Body Text", "List Item"):
            base[prior] += 0.1
        if short and prior == "Body Text":
            base["Section Header"] += 0.05
        total = sum(base.values())
        # tie-break by class name for determinism
        return sorted(((v / total, c) for c, v in base.items()), reverse=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        text = batch.column("text")
        n = batch.num_rows
        # combo id per row, all-arrow: tag -> prior-class index, plus the
        # ends-period / short feature bits
        ti = pc.fill_null(
            pc.index_in(batch.column("tag"), value_set=self._tag_keys),
            len(self._tag_prior_idx) - 1,
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        prior_idx = self._tag_prior_idx[ti]
        endsp = pc.ends_with(text, pattern=".").to_numpy(zero_copy_only=False)
        short = pc.less(pc.utf8_length(text), pa.scalar(30)).to_numpy(
            zero_copy_only=False
        )
        combo = pa.array(prior_idx * 4 + endsp * 2 + short)
        classes_col = pc.take(self._combo_classes_arr, combo)
        scores_col = pc.take(self._combo_scores_arr, combo)
        cls_arr = pc.take(self._combo_top_cls, combo)
        score_arr = pc.take(self._combo_top_score, combo)

        # rules postprocess (reference `pp_rules.py:7-35`): vectorized
        # RE2 caption override, score := 1.0
        is_tab = pc.match_substring_regex(text, r"(?i)^(table|tbl|tab)\.? ?[0-9]")
        is_fig = pc.and_not(
            pc.match_substring_regex(text, r"(?i)^(figure|fig|scheme|plate)\.? ?[0-9]"),
            is_tab,
        )
        cls_arr = pc.if_else(is_tab, pa.scalar("Table Caption"), cls_arr)
        cls_arr = pc.if_else(is_fig, pa.scalar("Figure Caption"), cls_arr)
        score_arr = pc.if_else(
            pc.or_(is_tab, is_fig), pa.scalar(1.0, pa.float32()), score_arr
        )

        neighbors = None
        if self.page_context:
            other_any = pc.any(pc.equal(cls_arr, pa.scalar("Other"))).as_py()
            if self.emit_neighbors or other_any:
                # exact path (feature emission / rare unknown-class rows)
                # needs the class strings in python
                cls_col = cls_arr.to_pylist()
                score_col = score_arr.to_pylist()
                neighbors = self._apply_page_context(batch, cls_col, score_col)
                cls_arr = pa.array(cls_col, pa.string())
                score_arr = pa.array(score_col, pa.float32())
            elif pc.any(pc.equal(cls_arr, pa.scalar("Table"))).as_py():
                cls_arr, score_arr = self._page_context_fast(batch, cls_arr, score_arr)

        out = batch.append_column("classes", classes_col)
        out = out.append_column("scores", scores_col)
        out = out.append_column("cls", cls_arr)
        out = out.append_column("score", score_arr)
        if self.emit_neighbors:
            out = out.append_column(
                "neighbor_cls",
                pa.array([x or [] for x in (neighbors or [[]] * n)],
                         pa.list_(pa.string())),
            )
        return out

    def _page_context_fast(self, batch: pa.Table, cls_arr, score_arr):
        """Conversion-free isolated-table-cell rule: url-group bounds,
        neighbor windows and table-like counts all computed on arrow/
        numpy arrays; the sparse demotions apply via one ``if_else``.
        Same semantics as the fast pass of ``_apply_page_context``."""
        import pyarrow.compute as pc

        n = batch.num_rows
        u = batch.column("url")
        changes = pc.not_equal(u.slice(1), u.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        ) if n > 1 else np.array([], dtype=bool)
        starts = np.concatenate(
            [[0], np.flatnonzero(changes) + 1, [n]]
        ).astype(np.int64)
        page = batch.column("page_num").to_numpy(zero_copy_only=False).astype(np.float64)
        bb = batch.column("bbox")
        flat = bb.combine_chunks() if isinstance(bb, pa.ChunkedArray) else bb
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.chunk(0)
        xy = flat.flatten().to_numpy(zero_copy_only=False).astype(np.float64).reshape(-1, 4)
        ay1 = page * _PAGE_H + xy[:, 1]
        ay2 = page * _PAGE_H + xy[:, 3]
        E2 = 2.0 * _CTX_EXPAND
        gidx = np.repeat(np.arange(len(starts) - 1), np.diff(starts))
        offset = float(ay2.max()) + E2 + 1.0
        gy1 = ay1 + gidx * offset
        gy2 = ay2 + gidx * offset
        tab = pc.equal(cls_arr, pa.scalar("Table")).to_numpy(zero_copy_only=False)
        table_like = pc.is_in(
            cls_arr, value_set=pa.array(["Table", "Table Caption"])
        ).to_numpy(zero_copy_only=False)
        tab_idx = np.flatnonzero(tab)
        if len(tab_idx) == 0:
            return cls_arr, score_arr
        # two-column pages break y monotonicity within a group — sort
        # (group offsets keep the global sort equal to per-group sorts)
        order = np.argsort(gy1, kind="stable")
        dem_sorted = _lonely_table_demotions(
            gy1[order], gy2[order], xy[:, 0][order], xy[:, 2][order],
            table_like[order],
            np.flatnonzero(tab[order]),
        )
        demote = order[dem_sorted]
        if len(demote) == 0:
            return cls_arr, score_arr
        mask = np.zeros(n, dtype=bool)
        mask[demote] = True
        mask_arr = pa.array(mask)
        cls_arr = pc.if_else(mask_arr, pa.scalar("Body Text"), cls_arr)
        score_arr = pc.if_else(mask_arr, pa.scalar(0.3, pa.float32()), score_arr)
        return cls_arr, score_arr

    def _apply_page_context(self, batch: pa.Table, cls_col: list, score_col: list):
        """Neighbor featurization + context rules (D2,
        `featurizer.py:84-125`): for each segment, neighbors = same-url
        segments whose +-_CTX_EXPAND-expanded boxes overlap, capped at
        the _MAX_NEIGHBORS nearest by vertical center distance. Rules
        (evaluated against the PRE-context classes so they commute):

        - isolated-table-cell demotion: a "Table" segment with neighbors
          but none of class Table / Table Caption becomes Body Text — a
          lone <td> floating in prose is markup noise, not a table;
        - unknown-class smoothing: an "Other" segment adopts the >=2/3
          majority class of its neighbors (the learned-context analog).

        Mutates cls_col/score_col in place; returns per-row neighbor
        class lists when ``emit_neighbors`` (feature-vector parity).
        """
        urls = np.asarray(batch.column("url").to_pylist(), dtype=object)
        page = batch.column("page_num").to_numpy(zero_copy_only=False).astype(np.float64)
        bb = batch.column("bbox")
        flat = bb.combine_chunks() if isinstance(bb, pa.ChunkedArray) else bb
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.chunk(0)
        xy = flat.flatten().to_numpy(zero_copy_only=False).astype(np.float64).reshape(-1, 4)
        ax1, ax2 = xy[:, 0], xy[:, 2]
        ay1 = page * _PAGE_H + xy[:, 1]
        ay2 = page * _PAGE_H + xy[:, 3]

        base_cls = np.asarray(cls_col, dtype=object)  # pre-context snapshot
        n = len(urls)
        neighbors_out: list | None = [None] * n if self.emit_neighbors else None
        if n == 0:
            return neighbors_out
        # rows needing context: only Table/Other segments consult their
        # neighbors (unless the feature column is requested) — the common
        # all-prose group is skipped with one vectorized check
        cand_mask = (base_cls == "Table") | (base_cls == "Other")
        if neighbors_out is None and not cand_mask.any():
            return neighbors_out
        bounds = np.flatnonzero(urls[1:] != urls[:-1]) + 1
        starts = np.concatenate([[0], bounds, [n]]).astype(np.int64)
        E2 = 2.0 * _CTX_EXPAND

        if neighbors_out is None:
            # Fast rules-only path: ONE global sorted pass. Per-group y
            # offsets keep neighbor windows inside one url; the shared
            # windowed-matrix helper applies the exact expanded-overlap
            # test in BOTH axes (two-column pages made the x check
            # load-bearing and broke the old y-monotone assumption).
            gidx = np.repeat(np.arange(len(starts) - 1), np.diff(starts))
            offset = float(ay2.max()) + E2 + 1.0
            gy1 = ay1 + gidx * offset
            gy2 = ay2 + gidx * offset
            table_like = (base_cls == "Table") | (base_cls == "Table Caption")
            tab = base_cls == "Table"
            if tab.any():
                order = np.argsort(gy1, kind="stable")
                dem_sorted = _lonely_table_demotions(
                    gy1[order], gy2[order], ax1[order], ax2[order],
                    table_like[order], np.flatnonzero(tab[order]),
                )
                for gi in order[dem_sorted]:
                    cls_col[gi], score_col[gi] = "Body Text", 0.3
            other_idx = np.flatnonzero(base_cls == "Other")
            if len(other_idx) == 0:
                return None
            # rare Other rows fall through to the exact per-group path
            cand_mask = base_cls == "Other"
            if not cand_mask.any():
                return None

        for s, e in zip(starts[:-1], starts[1:]):
            if neighbors_out is None and not cand_mask[s:e].any():
                continue
            m = int(e - s)
            # sort by y so each row's overlap set is a contiguous index
            # window (searchsorted) instead of an m x m matrix
            order = np.argsort(ay1[s:e], kind="stable")
            sy1, sy2 = ay1[s:e][order], ay2[s:e][order]
            sx1, sx2 = ax1[s:e][order], ax2[s:e][order]
            run_max_y2 = np.maximum.accumulate(sy2)
            centers = (sy1 + sy2) / 2.0
            rows = (
                range(m) if neighbors_out is not None
                else np.flatnonzero(cand_mask[s:e][order])
            )
            for li in rows:
                up = np.searchsorted(sy1, sy2[li] + E2, side="left")
                dn = np.searchsorted(run_max_y2, sy1[li] - E2, side="right")
                js = np.arange(dn, up)
                js = js[js != li]
                xok = (sx1[js] < sx2[li] + E2) & (sx1[li] < sx2[js] + E2)
                yok = sy2[js] > sy1[li] - E2  # run_max bound is conservative
                js = js[xok & yok]
                if len(js) > _MAX_NEIGHBORS:
                    o2 = np.argsort(np.abs(centers[js] - centers[li]), kind="stable")
                    js = js[o2[:_MAX_NEIGHBORS]]
                gi = s + int(order[li])
                ncls = [base_cls[s + int(order[j])] for j in js]
                if neighbors_out is not None:
                    neighbors_out[gi] = ncls
                if (
                    base_cls[gi] == "Table"
                    and ncls
                    and "Table" not in ncls
                    and "Table Caption" not in ncls
                ):
                    cls_col[gi], score_col[gi] = "Body Text", 0.3
                elif base_cls[gi] == "Other" and len(ncls) >= 2:
                    top, cnt = collections.Counter(ncls).most_common(1)[0]
                    if cnt * 3 >= len(ncls) * 2:
                        cls_col[gi], score_col[gi] = top, 0.25
        return neighbors_out


# per-worker-process singleton for the task-fused variant: same
# load-once-per-worker amortization as an actor pool, but lets Ray fuse
# the classifier into the surrounding task chain (no pool scheduling, no
# inter-operator transfer). Right for light deterministic state; use the
# actor-pool variant for heavy model state (GPU weights, big indexes).
_CLASSIFIER: SegmentClassifier | None = None


def classify_batch(t: pa.Table) -> pa.Table:
    global _CLASSIFIER
    if _CLASSIFIER is None:
        _CLASSIFIER = SegmentClassifier()
    return _CLASSIFIER(t)


def segment(extracted_ok, classifier_concurrency: int | tuple | None = (1, 4),
            batch_size: int | None = None):
    """extracted(ok) -> classified SEGMENTS dataset.

    ``classifier_concurrency=None`` selects the task-fused classifier
    (plain function + per-process cached state); a value selects an
    actor pool of that size (the shape for model-heavy classifiers).

    ``batch_size=None`` (one batch per block) is the default for BOTH
    paths: explode emits each url's segments contiguously within one
    block, and re-batching at a fixed row count could split a url across
    batches — breaking the whole-page-context invariant the classifier's
    neighbor featurization relies on."""
    segs = extracted_ok.map_batches(explode_segments, batch_format="pyarrow")
    if classifier_concurrency is None:
        return segs.map_batches(classify_batch, batch_format="pyarrow", batch_size=None)
    return segs.map_batches(
        SegmentClassifier,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=classifier_concurrency,
    )
