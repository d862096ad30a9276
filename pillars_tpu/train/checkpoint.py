"""Checkpointing: atomic pickle-pytree checkpoints + out-dir layout + an
importer stub for the reference's Keras .h5 weight files.

Pickled host pytrees were chosen over orbax deliberately: checkpoints here
are small (one detector + optimizer state, a few MB), single-host, and must
round-trip through plain Python tooling (the transfer-learning and analysis
flows read them with pickle directly); the atomic tmp+rename write gives the
needed crash safety without orbax's async machinery.

reference behavior replicated:
- auto-incrementing model dirs so a new run never clobbers an old one
  (reference libraries/train_helper_functions.py:95-143),
- best-score-gated retention: weights saved per epoch only when the eval
  score improves, plus a rolling "temp" checkpoint (reference
  train.py:403-440),
- optimizer state saved alongside for exact resume (the reference could
  only do this in a disabled debug branch, train.py:450-460).
"""

from __future__ import annotations

import os
import pathlib
import pickle
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def create_out_dirs(out_dir_base: str, model_id: str) -> Dict[str, str]:
    """Auto-incrementing out/model_<id>/ with checkpoint/log subdirs
    (reference train_helper_functions.py:95-143)."""
    base = pathlib.Path(out_dir_base)
    base.mkdir(parents=True, exist_ok=True)
    mid = str(model_id)
    while (base / f"model_{mid}").exists():
        mid = str(int(mid) + 1)
    model_dir = base / f"model_{mid}"
    dirs = {
        "model_dir": str(model_dir),
        "model_id": mid,
        "checkpoints": str(model_dir / "checkpoints"),
        "logs": str(model_dir / "logs"),
        "results": str(model_dir / "results"),
    }
    for k in ("checkpoints", "logs", "results"):
        pathlib.Path(dirs[k]).mkdir(parents=True, exist_ok=True)
    return dirs


# ---------------------------------------------------------------------------
# pickle-pytree checkpoints (simple, dependency-light, exact resume)
# ---------------------------------------------------------------------------

def save_checkpoint(path: str, state, extra: Optional[Dict] = None) -> None:
    """Save a TrainState (or any pytree) with host numpy leaves."""
    host_state = jax.device_get(state)
    payload = {"state": host_state, "extra": extra or {}}
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=4)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Tuple[Any, Dict]:
    with open(path, "rb") as f:
        payload = pickle.load(f)
    return payload["state"], payload.get("extra", {})


def save_params(path: str, params, batch_stats=None) -> None:
    save_checkpoint(path, {"params": params, "batch_stats": batch_stats})


def load_params(path: str):
    """Extract (params, batch_stats) from either checkpoint flavor:
    a params-only dict (save_params) or a full TrainState (save_checkpoint
    of the trainer's state tuple)."""
    state, _ = load_checkpoint(path)
    if isinstance(state, dict):
        return state["params"], state.get("batch_stats")
    if isinstance(state, tuple) and len(state) >= 3:
        # TrainState(step, params, batch_stats, opt_state)
        return state[1], state[2]
    raise ValueError(f"unrecognized checkpoint structure in {path}")


# ---------------------------------------------------------------------------
# reference .h5 import (Keras save_weights layout)
# ---------------------------------------------------------------------------

def _keras_h5_arrays(h5path: str) -> Dict[str, np.ndarray]:
    """Flatten a Keras save_weights .h5 into {path: array}."""
    import h5py

    out = {}

    def visit(name, obj):
        if isinstance(obj, h5py.Dataset):
            out[name] = np.asarray(obj)

    with h5py.File(h5path, "r") as f:
        f.visititems(visit)
    return out


def import_reference_h5(h5path: str, variables) -> Any:
    """Map a reference VoxelNet .h5 checkpoint onto this framework's
    variables pytree.

    Layer correspondence (reference model/voxelnet.py + pointpillars.py ->
    models/pfn.py + models/rpn.py):
      pillar_feature_net Dense/BN          -> pfn/dense, pfn/bn
      rpn blockN sepconv (depthwise/pointwise) + BN -> rpn/blockN/conv*/bn*
      rpn deconvN ConvTranspose + BN       -> rpn/deconvN
      conv_box / conv_cls / conv_dir_cls   -> rpn/conv_*

    Keras kernel layouts already match flax for Conv2D (H, W, I, O) and
    Dense (I, O); SeparableConv2D's depthwise kernel (H, W, I, depth_mult)
    maps to flax feature_group_count layout (H, W, 1, I) by transposing the
    last two axes. Conv2DTranspose kernels (H, W, O, I) transpose to flax's
    (H, W, I, O).

    Names inside the .h5 depend on Keras's auto-numbering, so matching is
    structural: datasets are bucketed by shape + role in traversal order.
    Raises with a clear message when the structure cannot be aligned.
    """
    arrays = _keras_h5_arrays(h5path)
    if not arrays:
        raise ValueError(f"no datasets found in {h5path}")
    raise NotImplementedError(
        "structural .h5 alignment requires a reference checkpoint to "
        "validate against; the shipped reference's model_weights_48.h5 is "
        "stripped from this mount (.MISSING_LARGE_BLOBS). The mapping table "
        "above documents the correspondence; supply a checkpoint and "
        "finish the alignment in tools/import_h5.py.")
