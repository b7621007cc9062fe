"""Checkpoint save/restore with retention policies.

Replaces the reference's estimator-managed checkpoints
(``RunConfig(save_checkpoints_steps=..., keep_checkpoint_max=5)`` —
deepfm/deepfm.py:163-166) and VAE-CF's hand-rolled best-metric ``saver.save``
(vae_cf_train_val.py:224-226) with a dependency-light pytree checkpointer:
arrays go into one ``.npz`` per step, pytree structure into a JSON manifest.

Works for any pytree (params / opt state / BN state / metric state). Device
arrays are fetched to host; restore returns numpy arrays which JAX re-places
on first use (or the caller device_puts them with the right sharding).
"""

from __future__ import annotations

import json
import os
import re
import shutil

import jax
import numpy as np


def _flatten(tree) -> tuple[dict[str, np.ndarray], list[tuple[str, str]]]:
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    arrays: dict[str, np.ndarray] = {}
    manifest: list[tuple[str, str]] = []
    for i, (path, leaf) in enumerate(leaves_with_paths):
        key = f"leaf_{i}"
        arrays[key] = np.asarray(leaf)
        manifest.append((jax.tree_util.keystr(path), key))
    return arrays, manifest


class CheckpointManager:
    """Step-indexed checkpoints with keep-last-k and keep-best retention."""

    def __init__(self, directory: str, keep_max: int = 5):
        self.directory = directory
        self.keep_max = keep_max
        os.makedirs(directory, exist_ok=True)
        self._best_metric: float | None = None
        best_meta = os.path.join(directory, "best", "meta.json")
        if os.path.exists(best_meta):
            with open(best_meta) as f:
                self._best_metric = json.load(f).get("metric")

    def _step_dirs(self) -> list[tuple[int, str]]:
        out = []
        for name in os.listdir(self.directory):
            m = re.fullmatch(r"step_(\d+)", name)
            if m:
                out.append((int(m.group(1)), os.path.join(self.directory, name)))
        return sorted(out)

    def save(self, step: int, tree, metric: float | None = None,
             extra: dict | None = None) -> str:
        """Save; if ``metric`` is given and improves, also refresh 'best/'
        (higher is better — the reference retains best NDCG,
        vae_cf_train_val.py:224-226)."""
        path = os.path.join(self.directory, f"step_{step}")
        # Crash-atomic: write under a .tmp name, publish with one rename.
        # A preemption mid-write leaves only step_N.tmp, which _step_dirs'
        # regex never matches — resume-from-latest always sees a complete
        # checkpoint (the elastic-recovery guarantee estimator gives via
        # its Saver, SURVEY §5.3/§5.4).
        tmp = path + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        self._write(tmp, step, tree, metric, extra)
        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(tmp, path)
        if metric is not None and (
            self._best_metric is None or metric > self._best_metric
        ):
            self._best_metric = metric
            best = os.path.join(self.directory, "best")
            best_tmp = best + ".tmp"
            if os.path.exists(best_tmp):
                shutil.rmtree(best_tmp)
            shutil.copytree(path, best_tmp)
            if os.path.exists(best):
                shutil.rmtree(best)
            os.rename(best_tmp, best)
        # retention
        dirs = self._step_dirs()
        for _, old in dirs[: max(0, len(dirs) - self.keep_max)]:
            shutil.rmtree(old)
        return path

    def _write(self, path, step, tree, metric, extra):
        os.makedirs(path, exist_ok=True)
        arrays, manifest = _flatten(tree)
        np.savez(os.path.join(path, "arrays.npz"), **arrays)
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(
                {
                    "step": step,
                    "metric": metric,
                    "manifest": manifest,
                    "extra": extra or {},
                },
                f,
            )

    def latest_step(self) -> int | None:
        dirs = self._step_dirs()
        return dirs[-1][0] if dirs else None

    def restore(self, tree_template, step: int | None = None,
                best: bool = False):
        """Restore into the structure of ``tree_template``. Returns
        (tree, step, extra) or None when no checkpoint exists."""
        if best:
            path = os.path.join(self.directory, "best")
            if not os.path.exists(path):
                return None
        else:
            if step is None:
                step = self.latest_step()
                if step is None:
                    return None
            path = os.path.join(self.directory, f"step_{step}")
            if not os.path.exists(path):
                return None
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        with np.load(os.path.join(path, "arrays.npz")) as z:
            arrays = {k: z[k] for k in z.files}
        leaves = [arrays[key] for _, key in meta["manifest"]]
        treedef = jax.tree_util.tree_structure(tree_template)
        template_leaves = jax.tree_util.tree_leaves(tree_template)
        if len(template_leaves) != len(leaves):
            raise ValueError(
                f"checkpoint has {len(leaves)} leaves, template has "
                f"{len(template_leaves)}"
            )
        restored = []
        for (pathstr, _), leaf, t in zip(meta["manifest"], leaves,
                                         template_leaves):
            leaf = np.asarray(leaf)
            want_shape, want_dtype = np.shape(t), np.asarray(t).dtype
            # strict: a silent cast/reshape would paper over a config or
            # model-version mismatch — fail loud instead
            if leaf.shape != want_shape:
                raise ValueError(
                    f"checkpoint leaf {pathstr}: shape {leaf.shape} != "
                    f"template {want_shape}"
                )
            if leaf.dtype != want_dtype:
                raise ValueError(
                    f"checkpoint leaf {pathstr}: dtype {leaf.dtype} != "
                    f"template {want_dtype}"
                )
            restored.append(leaf)
        return (
            jax.tree_util.tree_unflatten(treedef, restored),
            meta["step"],
            meta.get("extra", {}),
        )
