"""Tree and run persistence.

Mirrors the reference's two stores (SURVEY.md §5):
  * Trees: ``saved_trees/<name>/`` plus a ``recent/`` mirror, with the
    identity hash used to guard resume against tree/net mismatch
    (reference environment/tree.py:385-433, learn/rnad.py:256-258).
  * Runs: ``saved_runs/<name>/params.json`` (full config snapshot) plus one
    checkpoint file per ``(m, n)`` under ``saved_runs/<name>/<m>/<n>.ckpt``;
    resume scans for the maximal saved (m, n)
    (reference learn/rnad.py:190-319).

Array payloads are numpy ``.npz`` (trees) and flax msgpack bytes (run
states); metadata is JSON.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import numpy as np
from flax import serialization

from ..env import tree as tree_lib

# best.ckpt container format marker (see RunStore.save_best).
_BEST_MAGIC = b"RNADBEST1\n"


def _default_root(sub: str) -> str:
    return os.path.join(os.getcwd(), sub)


# ---------------------------------------------------------------------------
# Tree store
# ---------------------------------------------------------------------------


def save_tree(tree: tree_lib.GameTree, name: Optional[str] = None,
              root: Optional[str] = None, desc: str = "",
              config_json: Optional[dict] = None) -> str:
    root = root or _default_root("saved_trees")
    os.makedirs(root, exist_ok=True)
    if name is None:
        import time
        name = str(int(time.time()))
    meta = tree_lib.tree_meta(tree)
    meta["desc"] = desc
    if config_json is not None:
        meta["config"] = config_json
    arrays = tree_lib.tree_to_arrays(tree)
    for target in (name, "recent"):
        path = os.path.join(root, target)
        os.makedirs(path, exist_ok=True)
        np.savez_compressed(os.path.join(path, "tree.npz"), **arrays)
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f, indent=2)
    return os.path.join(root, name)


def load_reference_tree(path: str) -> tree_lib.GameTree:
    """Imports a tree saved by the reference implementation.

    The reference persists ``torch.save`` of its ``saved_keys`` dict as
    ``saved_trees/<name>/tree.tar`` (reference environment/tree.py:385-433):
    the seven game tensors plus scalars (max_actions, max_transitions, the
    random identity hash, desc).  Tensor layout conventions are identical by
    design (see tools/validate_vs_reference.py), so the import is a dtype
    cast plus a recomputation of the depth index, which the reference does
    not store.

    ``path`` may be the ``tree.tar`` file itself or its directory.
    """
    import torch

    if os.path.isdir(path):
        path = os.path.join(path, "tree.tar")
    saved = torch.load(path, map_location="cpu", weights_only=False)

    def arr(key, dtype):
        return np.asarray(saved[key].detach().cpu().numpy(), dtype=dtype)

    import jax.numpy as jnp

    index = arr("index_tensor", np.int32)
    chance = arr("chance_tensor", np.float32)
    # Validate structure BEFORE the depth fixpoint: child id > parent id
    # guarantees acyclicity, so depth_from_index converges in max_depth
    # passes.  On a malformed/cyclic tar the fixpoint would grind through
    # its (bounded) worst case instead of raising immediately.
    tree_lib.assert_index_array_is_tree(index)
    depth = tree_lib.depth_from_index(index, chance)
    tree = tree_lib.GameTree(
        index=jnp.asarray(index),
        value=jnp.asarray(arr("value_tensor", np.float32)),
        chance=jnp.asarray(chance),
        expected_value=jnp.asarray(arr("expected_value_tensor", np.float32)),
        legal=jnp.asarray(arr("legal_tensor", np.float32)),
        solution=jnp.asarray(arr("solution_tensor", np.float32)),
        root_value=jnp.asarray(arr("root_value_tensor", np.float32)),
        depth=jnp.asarray(depth, dtype=jnp.int32),
        max_actions=int(saved["max_actions"]),
        max_transitions=int(saved["max_transitions"]),
        max_depth=int(depth[1]),
        hash=int(saved["hash"]),
    )
    return tree


def load_tree(name: str = "recent",
              root: Optional[str] = None) -> tree_lib.GameTree:
    root = root or _default_root("saved_trees")
    path = os.path.join(root, name)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    with np.load(os.path.join(path, "tree.npz")) as z:
        arrays = {k: z[k] for k in z.files}
    return tree_lib.tree_from_arrays(arrays, meta)


# ---------------------------------------------------------------------------
# Run store
# ---------------------------------------------------------------------------


def _fetch_global(x):
    """Host numpy from a leaf that may span processes (collective for
    sharded leaves — every process must call this)."""
    import jax

    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from ..parallel.mesh import host_array
        return host_array(x)
    return x


class RunStore:
    """Directory-backed store of one training run's config and checkpoints."""

    def __init__(self, name: str, root: Optional[str] = None):
        self.root = root or _default_root("saved_runs")
        self.name = name
        self.directory = os.path.join(self.root, name)

    def exists(self) -> bool:
        return os.path.exists(os.path.join(self.directory, "params.json"))

    def save_params(self, params: dict) -> None:
        os.makedirs(self.directory, exist_ok=True)
        with open(os.path.join(self.directory, "params.json"), "w") as f:
            json.dump(params, f, indent=2, sort_keys=True)

    def load_params(self) -> dict:
        with open(os.path.join(self.directory, "params.json")) as f:
            return json.load(f)

    def checkpoint_path(self, m: int, n: int) -> str:
        return os.path.join(self.directory, str(m), f"{n}.ckpt")

    def save_checkpoint(self, m: int, n: int, state) -> str:
        """Atomic write of one (m, n) checkpoint.

        Multi-process safe: cross-process arrays are fetched to host on
        EVERY process (sharded leaves need the all-gather collective to run
        everywhere), then only process 0 touches the filesystem — the run
        directory is shared on pods."""
        import jax

        path = self.checkpoint_path(m, n)
        state = jax.tree.map(_fetch_global, state)
        if jax.process_index() != 0:
            return path
        os.makedirs(os.path.dirname(path), exist_ok=True)
        data = serialization.to_bytes(state)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
        return path

    def load_checkpoint(self, m: int, n: int, template):
        """Restores bytes into a pytree shaped like ``template``."""
        with open(self.checkpoint_path(m, n), "rb") as f:
            data = f.read()
        return serialization.from_bytes(template, data)

    def save_best(self, state, meta: dict) -> str:
        """Atomic write of the best-evaluated checkpoint + its metadata.

        Model selection by the exact evaluator (an extension the reference
        cannot offer — it has no in-loop exact NashConv): ``RNaD.run``
        calls this whenever a whole-tree eval improves on the best seen, so
        the served policy is the curve's minimum even when constant-lr
        self-play later erodes it (the U-shaped dynamic of docs/SCALE.md).
        Separate from the (m, n) resume chain: ``latest()`` never returns
        it, so crash-resume semantics are unchanged.

        The meta rides inside best.ckpt (magic header + length-prefixed
        JSON + msgpack state) so the (state, meta) pair is published by
        ONE os.replace — a crash can never leave a new checkpoint paired
        with a stale eval.  best.json is a human-readable mirror only;
        ``load_best`` never reads it."""
        import jax

        path = os.path.join(self.directory, "best.ckpt")
        state = jax.tree.map(_fetch_global, state)
        if jax.process_index() != 0:
            return path
        os.makedirs(self.directory, exist_ok=True)
        meta_b = json.dumps(meta, sort_keys=True).encode()
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(_BEST_MAGIC)
            f.write(len(meta_b).to_bytes(8, "little"))
            f.write(meta_b)
            f.write(serialization.to_bytes(state))
        os.replace(tmp, path)
        with open(path + ".tmp.json", "w") as f:
            json.dump(meta, f, indent=2, sort_keys=True)
        os.replace(path + ".tmp.json",
                   os.path.join(self.directory, "best.json"))
        return path

    def load_best_meta(self) -> Optional[dict]:
        """The meta dict of the stored best checkpoint, or None.

        Reads only the embedded header of best.ckpt (authoritative —
        best.json may lag it by one crash window); falls back to
        best.json for the legacy two-file layout."""
        path = os.path.join(self.directory, "best.ckpt")
        if not os.path.exists(path):
            return None
        with open(path, "rb") as f:
            head = f.read(len(_BEST_MAGIC) + 8)
            if head.startswith(_BEST_MAGIC):
                n = int.from_bytes(head[len(_BEST_MAGIC):], "little")
                return json.loads(f.read(n))
        legacy = os.path.join(self.directory, "best.json")
        if not os.path.exists(legacy):
            return None
        with open(legacy) as f:
            return json.load(f)

    def load_best(self, template):
        """(state, meta) of the best-evaluated checkpoint, or None."""
        path = os.path.join(self.directory, "best.ckpt")
        if not os.path.exists(path):
            return None
        with open(path, "rb") as f:
            blob = f.read()
        if blob.startswith(_BEST_MAGIC):
            off = len(_BEST_MAGIC)
            n = int.from_bytes(blob[off:off + 8], "little")
            meta = json.loads(blob[off + 8:off + 8 + n])
            return serialization.from_bytes(template, blob[off + 8 + n:]), \
                meta
        # Legacy layout: bare msgpack state + sibling best.json.
        with open(os.path.join(self.directory, "best.json")) as f:
            return serialization.from_bytes(template, blob), json.load(f)

    def latest(self) -> Optional[Tuple[int, int]]:
        """Max (m, n) with a saved checkpoint, resume semantics of
        reference rnad.py:243-272.  An m-directory left empty by an
        interrupted save is skipped in favor of the newest complete one
        (so a crash mid-checkpoint never silently restarts the run)."""
        if not os.path.isdir(self.directory):
            return None
        ms = sorted((int(d) for d in os.listdir(self.directory)
                     if d.isdigit()
                     and os.path.isdir(os.path.join(self.directory, d))),
                    reverse=True)
        for m in ms:
            ns = [int(f[:-5])
                  for f in os.listdir(os.path.join(self.directory, str(m)))
                  if f.endswith(".ckpt")]
            if ns:
                return m, max(ns)
        return None
