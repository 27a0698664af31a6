"""Checkpoint / resume of partially-processed streams.

The reference's complete inter-chunk state is small and explicit (chunker KV
store + per-object filter/demod state -- ref chunker.py:54-84,
filters.py:64-70, demod_fm.py:42-49); here it is an explicit pytree, so
serializing {state, next block index} gives resumable long-capture decoding
for free (SURVEY 5.4).
"""
from __future__ import annotations

import json
import os

import numpy as np
import jax


MAGIC = "directdemod-tpu-ckpt-v1"


def save(path: str, state, position: int, meta: dict | None = None) -> None:
    """Serialize a pipeline/front-end state pytree + stream position."""
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}
    np.savez(path, **arrays)
    side = {"magic": MAGIC, "position": int(position),
            "n_leaves": len(leaves), "meta": meta or {}}
    with open(path + ".json", "w") as f:
        json.dump(side, f)


def restore(path: str, like_state) -> tuple[object, int, dict]:
    """Rebuild (state, position, meta); `like_state` supplies the treedef."""
    with open(path + ".json") as f:
        side = json.load(f)
    if side.get("magic") != MAGIC:
        raise ValueError(f"{path}: not a directdemod-tpu checkpoint")
    data = np.load(path if path.endswith(".npz") else path + ".npz",
                   allow_pickle=False) if os.path.exists(path + ".npz") \
        else np.load(path, allow_pickle=False)
    leaves = [jax.numpy.asarray(data[f"leaf_{i}"])
              for i in range(side["n_leaves"])]
    _, treedef = jax.tree.flatten(like_state)
    return jax.tree.unflatten(treedef, leaves), side["position"], side["meta"]
