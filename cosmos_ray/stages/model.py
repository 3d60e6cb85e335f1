"""GPU-shaped actor-pool model stage — the template for porting the
reference's trained detector.

Reference analog: Cosmos loads Attentive-RCNN weights once per worker
process and runs batched inference per page
(`detection/src/torch_model/inference/inference.py:23-57`, preload at
`preload_plugins/detect_setup.py:6-15`). This module is the seam a user
porting that model plugs into:

- ``ModelSegmentClassifier`` is a callable CLASS: ``__init__`` loads a
  WEIGHTS FILE once per actor (and moves tensors to the GPU when torch
  + CUDA are available — Ray sets ``CUDA_VISIBLE_DEVICES`` for actors
  scheduled with ``num_gpus``); ``__call__`` is per-batch inference.
  Without torch (this container) the loaded weights drive the
  deterministic numpy scorer — the RESOURCE PLUMBING (actor pool,
  ``num_gpus``, ``fn_constructor_kwargs``, batch sizing) is identical
  to the real-model deployment, which is the point of the template.
- ``segment_with_model`` wires it into
  ``map_batches(Cls, concurrency=N, num_gpus=g, batch_size=B)``.

Swapping in a real torch model = replace ``_score_from_weights`` with a
forward pass; nothing about the Dataset pipeline changes.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from cosmos_ray.stages.segment import CLASSES, SegmentClassifier

_WEIGHTS_VERSION = 1


def save_default_weights(path: str) -> str:
    """Materialize the deterministic classifier's score table as a real
    weights file (npz + json header) — what a trained checkpoint is to
    the torch model. ``ModelSegmentClassifier`` loads scores from THIS
    file (authoritative), not from code, so the test proves the
    load-once-per-actor path end to end."""
    ref = SegmentClassifier()
    classes = np.array(
        [[c for c in row] for row in ref._combo_classes], dtype=object)
    scores = np.array(ref._combo_scores, dtype=np.float32)
    meta = {"version": _WEIGHTS_VERSION, "classes": CLASSES,
            "n_combos": len(ref._combo_classes)}
    tmp = path + f".tmp{os.getpid()}.npz"
    with open(tmp, "wb") as f:
        np.savez(f, combo_classes=classes, combo_scores=scores,
                 meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8))
    os.replace(tmp, path)  # atomic publish
    return path


class ModelSegmentClassifier(SegmentClassifier):
    """Weights-file-backed classifier actor. ``__init__`` (once per
    actor) reads the checkpoint, validates its header, and — when torch
    is importable — stages the score tensors on the actor's device; the
    per-batch ``__call__`` is inherited (vectorized takes against the
    loaded tables + rules + page context)."""

    def __init__(self, weights_path: str, page_context: bool = True,
                 device: str = "auto") -> None:
        super().__init__(page_context=page_context)
        if not os.path.exists(weights_path):
            raise FileNotFoundError(f"weights file missing: {weights_path}")
        with np.load(weights_path, allow_pickle=True) as z:
            meta = json.loads(bytes(z["meta"]).decode())
            if meta.get("version") != _WEIGHTS_VERSION:
                raise ValueError(
                    f"weights version {meta.get('version')} != {_WEIGHTS_VERSION}")
            if meta.get("classes") != CLASSES:
                raise ValueError("weights class vocabulary mismatch")
            classes = z["combo_classes"]
            scores = z["combo_scores"].astype(np.float32)
        if classes.shape[0] != meta["n_combos"] or \
                scores.shape != classes.shape:
            raise ValueError("weights shape mismatch")
        # the FILE is authoritative: replace the code-derived tables
        self._combo_classes = [list(row) for row in classes]
        self._combo_scores = [list(map(float, row)) for row in scores]
        self._combo_classes_arr = pa.array(
            self._combo_classes, pa.list_(pa.string()))
        self._combo_scores_arr = pa.array(
            self._combo_scores, pa.list_(pa.float32()))
        self._combo_top_cls = pa.array(
            [c[0] for c in self._combo_classes], pa.string())
        self._combo_top_score = pa.array(
            [s[0] for s in self._combo_scores], pa.float32())
        self.device = self._resolve_device(device)

    @staticmethod
    def _resolve_device(device: str) -> str:
        """'auto' -> 'cuda' when torch sees a GPU (Ray exposes the
        actor's ``num_gpus`` share via CUDA_VISIBLE_DEVICES), else
        'cpu'. Honest template: no torch in this container -> 'cpu'."""
        if device != "auto":
            return device
        try:  # pragma: no cover - torch absent in this container
            import torch

            return "cuda" if torch.cuda.is_available() else "cpu"
        except ImportError:
            return "cpu"


def segment_with_model(extracted_ok, weights_path: str,
                       concurrency: int | tuple = (1, 4),
                       num_gpus: float = 0.0,
                       batch_size: int | None = None):
    """extracted(ok) -> classified SEGMENTS via the weights-backed actor
    pool. ``num_gpus`` > 0 reserves a GPU share per actor (e.g. 0.25 =
    four classifier actors per device — the reference runs one model
    per GPU worker, `cosmos_service` device config); 0 runs CPU actors.
    ``batch_size=None`` keeps one batch per block (whole-url invariant,
    see ``segment.segment``); set it smaller for wide GPU models so a
    batch x concurrency fits device memory."""
    from cosmos_ray.stages.segment import explode_segments

    segs = extracted_ok.map_batches(explode_segments, batch_format="pyarrow")
    kw: dict = dict(
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"weights_path": weights_path},
    )
    if num_gpus:
        kw["num_gpus"] = num_gpus
    return segs.map_batches(ModelSegmentClassifier, **kw)
