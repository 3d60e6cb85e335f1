"""Evaluation-harness aggregates: detection AP and per-document P/R/F1.

Reference analogs:
- AP@[.5:.95] / AP50 / AP75 per region class, computed from per-page IoU
  matching then precision-recall integration
  (`cosmos_service/src/healthcheck/page_metrics.py:63-123`; the golden-
  document gate asserts AP > 0.9, `annotation_metrics.py:10-11`);
- per-document precision/recall/F1 self-evaluation with a describe-style
  summary (`enrich/context_enrichment.py:246-319,110-115`).

Ray-Data shape: predictions and annotations are tagged, unioned, and
grouped per (url, class) through the coarse-bucket shuffle; per-group
COCO-style greedy matching emits ONE match record per prediction (score +
per-threshold tp bitmask) plus per-class annotation counts — the only
rows that cross the second (tiny, per-class) exchange where the P/R curve
is integrated. Designed for annotation-sample scale (golden labels exist
for a labeled subset, as in the reference's annotated-document tests).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from cosmos_ray.functions.geometry import pairwise_iou

AP_THRESHOLDS = np.round(np.arange(0.50, 0.96, 0.05), 2)  # .5 ... .95


def golden_annotations(golden_segments: pa.Table) -> pa.Table:
    """Golden (url, seg_id, cls, text) rows -> annotation boxes using the
    same deterministic layout as the explode stage (single source of
    truth: ``segment.synthetic_bboxes``)."""
    from cosmos_ray.stages.segment import (
        _BLOCKS_PER_PAGE,
        did_of_url,
        layout_twocol_mask,
        synthetic_bboxes,
    )

    seg_id = np.asarray(golden_segments.column("seg_id").to_pylist(), dtype=np.int32)
    lens = np.asarray(
        [len(t) for t in golden_segments.column("text").to_pylist()], dtype=np.float32
    )
    dids = np.asarray(
        [did_of_url(u) for u in golden_segments.column("url").to_pylist()],
        dtype=np.int64,
    )
    tag_list = golden_segments.column("tag").to_pylist()
    td = np.asarray([t == "td" for t in tag_list], dtype=bool)
    pre = np.asarray([t == "pre" for t in tag_list], dtype=bool)
    twocol = layout_twocol_mask(dids, seg_id.astype(np.int64), td, pre)
    boxes = synthetic_bboxes(seg_id, lens, twocol)
    return pa.table(
        {
            "url": golden_segments.column("url"),
            "page_num": pa.array((seg_id // _BLOCKS_PER_PAGE).astype(np.int32)),
            "cls": golden_segments.column("cls"),
            "bbox": pa.FixedSizeListArray.from_arrays(
                pa.array(boxes.reshape(-1), pa.float32()), 4
            ),
        }
    )


def _tag(side: str):
    def f(t: pa.Table) -> pa.Table:
        return t.append_column("__side", pa.array([side] * t.num_rows, pa.string()))

    return f


def _match_group(g: pd.DataFrame) -> pd.DataFrame:
    """One (url, cls) group: COCO-style greedy matching per page and
    threshold. Emits 'pred' rows (score, tp bitmask over AP_THRESHOLDS)
    and one 'gold' row carrying the annotation count."""
    out_kind, out_cls, out_score, out_mask, out_n = [], [], [], [], []
    cls = g["cls"].iloc[0]
    n_gold_total = int((g["__side"] == "g").sum())
    for _, page in g.groupby("page_num", sort=False):
        preds = page[page["__side"] == "p"]
        golds = page[page["__side"] == "g"]
        if len(preds) == 0:
            continue
        preds = preds.sort_values("score", ascending=False, kind="stable")
        pb = np.asarray([list(b) for b in preds["bbox"]], dtype=np.float64)
        scores = preds["score"].to_numpy()
        if len(golds) == 0:
            masks = np.zeros(len(preds), dtype=np.int64)
        else:
            gb = np.asarray([list(b) for b in golds["bbox"]], dtype=np.float64)
            iou = pairwise_iou(pb, gb)
            masks = np.zeros(len(preds), dtype=np.int64)
            for ti, thr in enumerate(AP_THRESHOLDS):
                taken = np.zeros(len(golds), dtype=bool)
                for pi in range(len(preds)):
                    cand = np.flatnonzero(~taken & (iou[pi] >= thr))
                    if len(cand):
                        best = cand[np.argmax(iou[pi][cand])]
                        taken[best] = True
                        masks[pi] |= 1 << ti
        out_kind.extend(["pred"] * len(preds))
        out_cls.extend([cls] * len(preds))
        out_score.extend(scores.tolist())
        out_mask.extend(masks.tolist())
        out_n.extend([0] * len(preds))
    out_kind.append("gold")
    out_cls.append(cls)
    out_score.append(0.0)
    out_mask.append(0)
    out_n.append(n_gold_total)
    return pd.DataFrame(
        {"kind": out_kind, "cls": out_cls, "score": out_score,
         "tp_mask": out_mask, "n_gold": out_n}
    )


def _ap_from_records(g: pd.DataFrame) -> pd.DataFrame:
    """One class's match records -> AP (mean over thresholds), AP50,
    AP75 via all-point precision-recall integration."""
    cls = g["cls"].iloc[0]
    n_gold = int(g.loc[g["kind"] == "gold", "n_gold"].sum())
    preds = g[g["kind"] == "pred"].sort_values("score", ascending=False, kind="stable")
    masks = preds["tp_mask"].to_numpy(dtype=np.int64)
    aps = []
    for ti in range(len(AP_THRESHOLDS)):
        if n_gold == 0:
            aps.append(float("nan"))
            continue
        tp = ((masks >> ti) & 1).astype(np.float64)
        cum_tp = np.cumsum(tp)
        cum_fp = np.cumsum(1.0 - tp)
        recall = cum_tp / n_gold
        precision = cum_tp / np.maximum(cum_tp + cum_fp, 1.0)
        # monotone precision envelope + all-point integration
        prec_env = np.maximum.accumulate(precision[::-1])[::-1]
        r_prev = 0.0
        ap = 0.0
        for r, p in zip(recall, prec_env):
            ap += (r - r_prev) * p
            r_prev = r
        aps.append(ap)
    aps_arr = np.asarray(aps, dtype=np.float64)
    return pd.DataFrame(
        {
            "cls": [cls],
            "ap": [round(float(np.nanmean(aps_arr)), 6)],
            "ap50": [round(float(aps_arr[0]), 6)],
            "ap75": [round(float(aps_arr[5]), 6)],
            "n_pred": [int(len(preds))],
            "n_gold": [n_gold],
        }
    )


def detection_ap(pred_segments, golden_annotations_tbl: pa.Table, num_buckets: int = 64):
    """Predicted segments (url, page_num, cls, score, bbox) vs golden
    annotations -> per-class AP@[.5:.95] / AP50 / AP75 (G10)."""
    from cosmos_ray.queries.relational import bucketed_group_apply

    preds = pred_segments.select_columns(["url", "page_num", "cls", "score", "bbox"])
    golds = rd.from_arrow(golden_annotations_tbl).map_batches(
        lambda t: t.append_column("score", pa.array([0.0] * t.num_rows, pa.float32())),
        batch_format="pyarrow",
    ).select_columns(["url", "page_num", "cls", "score", "bbox"])
    both = preds.map_batches(_tag("p"), batch_format="pyarrow").union(
        golds.map_batches(_tag("g"), batch_format="pyarrow")
    )
    records = bucketed_group_apply(
        both, keys=["url", "cls"], fn=_match_group, num_buckets=num_buckets
    )
    return records.groupby("cls").map_groups(_ap_from_records, batch_format="pandas")


def _prf_group(g: pd.DataFrame) -> pd.DataFrame:
    """One url's tagged class rows -> P/R/F1 over the class multiset
    (`context_enrichment.py:246-319` per-doc self-eval shape)."""
    url = g["url"].iloc[0]
    pred = g[g["__side"] == "p"]["cls"].value_counts()
    gold = g[g["__side"] == "g"]["cls"].value_counts()
    all_cls = set(pred.index) | set(gold.index)
    tp = sum(min(int(pred.get(c, 0)), int(gold.get(c, 0))) for c in all_cls)
    n_pred, n_gold = int(pred.sum()), int(gold.sum())
    p = tp / n_pred if n_pred else 0.0
    r = tp / n_gold if n_gold else 0.0
    f1 = 2 * p * r / (p + r) if (p + r) else 0.0
    return pd.DataFrame(
        {"url": [url], "precision": [round(p, 6)], "recall": [round(r, 6)],
         "f1": [round(f1, 6)], "n_pred": [n_pred], "n_gold": [n_gold]}
    )


def detection_prf(pred_segments, golden_annotations_tbl: pa.Table, num_buckets: int = 64):
    """Per-document P/R/F1 of predicted classes vs golden (G9)."""
    from cosmos_ray.queries.relational import bucketed_group_apply

    preds = pred_segments.select_columns(["url", "cls"])
    golds = rd.from_arrow(golden_annotations_tbl).select_columns(["url", "cls"])
    both = preds.map_batches(_tag("p"), batch_format="pyarrow").union(
        golds.map_batches(_tag("g"), batch_format="pyarrow")
    )
    return bucketed_group_apply(both, keys=["url"], fn=_prf_group, num_buckets=num_buckets)


def prf_summary(prf_ds):
    """describe-style global summary of the per-doc P/R/F1 rows
    (`context_enrichment.py:110-115`): one row of means/mins + doc count."""
    from ray.data.aggregate import Count, Mean, Min

    agg = prf_ds.aggregate(
        Mean("precision", alias_name="mean_precision"),
        Mean("recall", alias_name="mean_recall"),
        Mean("f1", alias_name="mean_f1"),
        Min("f1", alias_name="min_f1"),
        Count(alias_name="n_docs"),
    )
    row = {k: (round(v, 6) if isinstance(v, float) else v) for k, v in agg.items()}
    return pa.Table.from_pylist([row])
