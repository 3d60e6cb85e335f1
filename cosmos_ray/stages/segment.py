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

Determinism: features are per-row only (tag hint + text shape), so class
output is independent of batch boundaries — the whole-page-context
variant (neighbor features, `featurizer.py:91-102`) would require
page-contiguous batches; see ``group_pages_batches`` note.
"""

from __future__ import annotations

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
    line_in_page = (seg_id % _BLOCKS_PER_PAGE).astype(np.float32)

    # synthetic bbox: vertical stack, width proportional to text length
    import pyarrow.compute as pc

    lens = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.float32)
    y1 = 72.0 + line_in_page * (_PAGE_H - 144.0) / _BLOCKS_PER_PAGE
    y2 = y1 + _LINE_H
    x1 = np.full(total, _X0, np.float32)
    x2 = np.minimum(_X0 + 6.0 * lens, 1848.0).astype(np.float32)
    bbox_flat = np.empty(total * 4, np.float32)
    bbox_flat[0::4] = x1
    bbox_flat[1::4] = y1
    bbox_flat[2::4] = x2
    bbox_flat[3::4] = y2
    bbox = pa.FixedSizeListArray.from_arrays(pa.array(bbox_flat, pa.float32()), 4)

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


class SegmentClassifier:
    """Actor-pool classifier: ranked (score, cls) list per segment +
    rules postprocess. Pass to
    ``ds.map_batches(SegmentClassifier, concurrency=N, batch_size=B,
    batch_format="pyarrow")``.

    A deterministic featurized scorer stands in for the reference's
    RCNN+XGBoost stack (no torch in this container); the *contract* —
    per-segment descending class ranking, postprocessed argmax, caption
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
        "pre": "Body Text",
        "li": "List Item",
        "td": "Table",
        "th": "Table",
        "caption": "Table Caption",
        "figcaption": "Figure Caption",
    }

    def __init__(self) -> None:
        # once per actor: compile rules (reference: models loaded in
        # worker plugins, `preload_plugins/detect_setup.py:6-15`) and
        # precompute the ranked score table over the small feature space
        # (prior-class x ends-period x short) so per-batch work is a
        # vectorized combo lookup, not per-row dict sorting.
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
        import pandas as pd
        import pyarrow.compute as pc

        tags = pd.Series(batch.column("tag").to_pylist(), dtype=object)
        texts = pd.Series(batch.column("text").to_pylist(), dtype=object)
        n = len(tags)

        prior = tags.map(self._TAG_PRIOR).fillna("Other")
        endsp = texts.str.endswith(".").to_numpy()
        short = (texts.str.len() < 30).to_numpy()
        combo = np.fromiter(
            (self._combo_of[(p, bool(e), bool(s))] for p, e, s in zip(prior, endsp, short)),
            dtype=np.int64,
            count=n,
        )
        classes_col = [self._combo_classes[c] for c in combo]
        scores_col = [self._combo_scores[c] for c in combo]
        cls_col = [self._combo_classes[c][0] for c in combo]
        score_col = [self._combo_scores[c][0] for c in combo]

        # rules postprocess (reference `pp_rules.py:7-35`): vectorized
        # regex caption override, score := 1.0
        is_tab = texts.str.match(self.re_table_cap).to_numpy()
        is_fig = (~is_tab) & texts.str.match(self.re_figure_cap).to_numpy()
        for i in np.flatnonzero(is_tab):
            cls_col[i], score_col[i] = "Table Caption", 1.0
        for i in np.flatnonzero(is_fig):
            cls_col[i], score_col[i] = "Figure Caption", 1.0

        out = batch.append_column("classes", pa.array(classes_col, pa.list_(pa.string())))
        out = out.append_column("scores", pa.array(scores_col, pa.list_(pa.float32())))
        out = out.append_column("cls", pa.array(cls_col, pa.string()))
        out = out.append_column("score", pa.array(score_col, pa.float32()))
        return out


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
            batch_size: int = 2048):
    """extracted(ok) -> classified SEGMENTS dataset.

    ``classifier_concurrency=None`` selects the task-fused classifier
    (plain function + per-process cached state); a value selects an
    actor pool of that size (the shape for model-heavy classifiers)."""
    segs = extracted_ok.map_batches(explode_segments, batch_format="pyarrow")
    if classifier_concurrency is None:
        # batch_size=None: keep one batch per block (see link.py note)
        return segs.map_batches(classify_batch, batch_format="pyarrow", batch_size=None)
    return segs.map_batches(
        SegmentClassifier,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=classifier_concurrency,
    )
