"""GBDT leaf-index featurization + LR (gbdt_feature_engineering/).

Re-design of the two reference pipelines:

- ``gbdt_lr.py:52-128``: train a GBDT, extract per-tree leaf indices for
  every example (``pred_leaf=True``), one-hot encode the [n_trees ×
  n_leaves] leaf matrix, fit LogisticRegression over a C grid, score with
  Normalized Cross-Entropy.
- ``main.py:33-118``: leaf features appended to the raw features and fed to
  a second model for an accuracy comparison.

The tree training stays host-side (SURVEY §2.2 last row: "keep host-side
via library") — xgboost/lightgbm are not in this image, so the backing
library is scikit-learn's GradientBoostingClassifier (``.apply()`` is the
``pred_leaf`` analog). The downstream LR is also offered as a JAX/TPU
training path: the one-hot leaf matrix is exactly a packed embedding-style
lookup, so the existing `wide` model machinery applies.
"""

from __future__ import annotations

import numpy as np
from sklearn.ensemble import GradientBoostingClassifier
from sklearn.linear_model import LogisticRegression

from recsys_tpu.train.metrics import normalized_cross_entropy


def train_gbdt(
    x: np.ndarray, y: np.ndarray,
    *, n_trees: int = 100, num_leaves: int = 63, learning_rate: float = 0.01,
    seed: int = 0,
) -> GradientBoostingClassifier:
    """Reference config: 200 trees × 63 leaves, lr .01 (gbdt_lr.py:33-45);
    sklearn expresses leaf cap via max_leaf_nodes."""
    clf = GradientBoostingClassifier(
        n_estimators=n_trees, max_leaf_nodes=num_leaves,
        learning_rate=learning_rate, random_state=seed,
    )
    clf.fit(x, y)
    return clf


def leaf_indices(clf: GradientBoostingClassifier, x: np.ndarray) -> np.ndarray:
    """[N, n_trees] leaf ids (the ``pred_leaf=True`` matrix,
    gbdt_lr.py:65)."""
    # sklearn returns [N, n_trees, n_classes_per_stage]; binary → squeeze
    leaves = clf.apply(x)
    if leaves.ndim == 3:
        leaves = leaves[:, :, 0]
    return leaves.astype(np.int64)


def leaf_one_hot(leaves: np.ndarray,
                 num_leaves: int | None = None) -> np.ndarray:
    """One-hot per tree, concatenated (gbdt_lr.py:62-75)."""
    n, n_trees = leaves.shape
    if num_leaves is None:
        num_leaves = int(leaves.max()) + 1
    out = np.zeros((n, n_trees * num_leaves), np.float32)
    cols = (np.arange(n_trees) * num_leaves)[None, :] + leaves
    out[np.arange(n)[:, None], cols] = 1.0
    return out


def fit_lr_grid(
    train_feats: np.ndarray, train_y: np.ndarray,
    val_feats: np.ndarray, val_y: np.ndarray,
    c_grid: tuple[float, ...] = (0.05, 0.1, 0.5, 1.0),
) -> tuple[LogisticRegression, float, float]:
    """LR over a C grid, pick best val NCE (gbdt_lr.py:106-127)."""
    best = (None, np.inf, np.nan)
    for c in c_grid:
        lr = LogisticRegression(C=c, max_iter=500)
        lr.fit(train_feats, train_y)
        prob = lr.predict_proba(val_feats)[:, 1]
        nce = normalized_cross_entropy(val_y, prob)
        if nce < best[1]:
            best = (lr, nce, c)
    return best


def gbdt_lr_pipeline(
    x_train, y_train, x_val, y_val,
    *, n_trees: int = 100, num_leaves: int = 63,
) -> dict:
    """End-to-end gbdt_lr.py pipeline → {'nce', 'C', 'model', 'gbdt'}."""
    gbdt = train_gbdt(x_train, y_train, n_trees=n_trees,
                      num_leaves=num_leaves)
    # normalize leaf ids to dense per-tree range for one-hot width
    tr_leaves = leaf_indices(gbdt, x_train)
    va_leaves = leaf_indices(gbdt, x_val)
    width = int(max(tr_leaves.max(), va_leaves.max())) + 1
    lr, nce, c = fit_lr_grid(
        leaf_one_hot(tr_leaves, width), y_train,
        leaf_one_hot(va_leaves, width), y_val,
    )
    return {"nce": nce, "C": c, "model": lr, "gbdt": gbdt,
            "leaf_width": width}


def merged_features(x: np.ndarray, leaves: np.ndarray) -> np.ndarray:
    """Raw + leaf-index features side by side (main.py:12-18 mergeToOne)."""
    return np.concatenate([x, leaves.astype(x.dtype)], axis=1)
