"""Magnitude pruning with straight-through estimation.

Replaces the reference's `jaxpruner` dependency (integration points:
train_helpers.py:283/:509/:637-638/:743-744/:777-781; configs
utils/pruning.py:7-54) with a self-contained implementation:

- iterative magnitude pruning on a cubic (polynomial) sparsity schedule,
  updating masks every ``update_freq`` steps between ``update_start`` and
  ``update_end`` (the reference recipes use 5%->90% of training, every
  half-epoch)
- ERK (Erdos-Renyi-Kernel) or uniform per-layer sparsity distribution
- STE: the forward pass sees masked weights, gradients flow dense
- per-layer and global sparsity summaries

Everything is functional: masks live in a pytree next to the params (kept
in the TrainState), all updates are jit-friendly (mask recomputation uses
a fixed per-layer threshold via top-k on sorted magnitudes — static shapes).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

PyTree = Any


@dataclasses.dataclass(frozen=True)
class PruningConfig:
    """Schedule + distribution for iterative magnitude pruning."""

    final_sparsity: float = 0.0
    update_start: int = 0      # first step at which masks may update
    update_end: int = 1        # step at which final sparsity is reached
    update_freq: int = 1       # steps between mask updates
    distribution: str = "erk"  # "erk" | "uniform"
    mode: str = "ste"          # "ste" | "hard" (hard also zeroes gradients)
    min_ndim: int = 2          # only prune leaves with >= this many dims
    # "unstructured": per-weight magnitude (the reference's recipes —
    # masked-dense on the MXU, NO flop reduction on TPU).
    # "state": prune whole SSM state CHANNELS (B̄ rows + C columns
    # jointly, scored by their product contribution) — the structure the
    # MXU can actually exploit: the serving engine compacts pruned
    # channels away, shrinking the scan width and both projections
    # (SURVEY §7 hard part "unstructured 90% sparsity on TPU").
    # "block": prune whole ``block_shape`` TILES of the 2-D dense kernels
    # (encoder/decoder/GLU gates), scored by Frobenius norm — zero tiles
    # are skipped outright by the serving engine's block-sparse matmul
    # (ops/pallas/block_sparse.py): real FLOP + HBM savings equal to the
    # zero-tile fraction.
    structure: str = "unstructured"
    block_shape: tuple = (32, 128)   # (sublane, lane) tile for "block"

    @property
    def enabled(self) -> bool:
        return self.final_sparsity > 0.0

    @staticmethod
    def iterative_ste(final_sparsity: float, epochs: int,
                      steps_per_epoch: int) -> "PruningConfig":
        """The reference's `iterative-ste-mag-X` recipe shape
        (utils/pruning.py:7-19): update every half-epoch, ramping from 5%
        to 90% of total training steps, ERK distribution."""
        total = epochs * steps_per_epoch
        return PruningConfig(
            final_sparsity=final_sparsity,
            update_start=int(0.05 * total),
            update_end=int(0.9 * total),
            update_freq=max(1, steps_per_epoch // 2),
            distribution="erk",
            mode="ste",
        )


def pruning_recipes(epochs: int, steps_per_epoch: int) -> dict:
    """Name -> config map mirroring reference `pruning_recipe_map`
    (utils/pruning.py:22-54)."""
    recipes = {"no_prune": PruningConfig()}
    for s in (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 0.95):
        recipes[f"iterative-ste-mag-{s}"] = PruningConfig.iterative_ste(
            s, epochs, steps_per_epoch)
        # structured state-channel pruning (uniform across layers: channel
        # groups don't have an ERK analog)
        base = PruningConfig.iterative_ste(s, epochs, steps_per_epoch)
        recipes[f"iterative-ste-state-{s}"] = dataclasses.replace(
            base, structure="state", distribution="uniform")
        # tile pruning of the dense kernels (block-sparse serving)
        recipes[f"iterative-ste-block-{s}"] = dataclasses.replace(
            base, structure="block", distribution="uniform")
    return recipes


_NEVER_PRUNE = (
    # quantization scales / norm parameters
    "scale", "bias", "mean", "var",
    # SSM dynamics: zeroing timescales or eigenvalues corrupts the model
    # rather than sparsifying compute (log_step is (P,1) so ndim alone
    # doesn't exclude it)
    "log_step", "Lambda_re", "Lambda_im",
)


def _prunable(path_leaf, cfg: PruningConfig) -> bool:
    path, leaf = path_leaf
    if leaf.ndim < cfg.min_ndim:
        return False
    # block mode targets exactly the 2-D dense kernels (B/C/Λ are covered
    # by the state-channel structure instead)
    if cfg.structure == "block" and leaf.ndim != 2:
        return False
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    if any(n in _NEVER_PRUNE for n in names):
        return False
    return True


def _erk_density_factor(shape) -> float:
    """ERK keeps density proportional to sum(dims)/prod(dims)."""
    n = 1
    s = 0
    for d in shape:
        n *= d
        s += d
    return s / n


def sparsity_distribution(params: PyTree, cfg: PruningConfig) -> PyTree:
    """Per-leaf target-sparsity *fractions of the global target*: returns a
    pytree of floats in [0, 1] scaled such that the global (parameter-
    weighted) sparsity equals 1.0; multiply by the scheduled sparsity to get
    per-layer targets. Non-prunable leaves get 0."""
    leaves = jax.tree_util.tree_leaves_with_path(params)
    prunable = {jax.tree_util.keystr(p): l for p, l in leaves
                if _prunable((p, l), cfg)}
    if not prunable:
        return jax.tree_util.tree_map(lambda _: 0.0, params)

    if cfg.distribution == "uniform":
        per_layer = {k: 1.0 for k in prunable}
    elif cfg.distribution == "erk":
        # ERK at the FINAL sparsity target: density_l = eps * f_l with
        # saturation at 1; returned multipliers are s_l / s_final so the
        # cubic schedule scales every layer proportionally (this is how
        # jaxpruner applies a custom distribution under a schedule).
        s_final = max(cfg.final_sparsity, 1e-6)
        factors = {k: _erk_density_factor(l.shape)
                   for k, l in prunable.items()}
        sizes = {k: l.size for k, l in prunable.items()}
        total = sum(sizes.values())
        saturated: set = set()
        eps = 0.0
        for _ in range(len(prunable) + 1):
            rhs = (1.0 - s_final) * total - sum(
                sizes[k] for k in saturated)
            denom = sum(sizes[k] * factors[k]
                        for k in prunable if k not in saturated)
            if denom <= 0:
                break
            eps = rhs / denom
            newly = {k for k in prunable
                     if k not in saturated and eps * factors[k] >= 1.0}
            if not newly:
                break
            saturated |= newly
        per_layer = {}
        for k in prunable:
            density = 1.0 if k in saturated else min(1.0, eps * factors[k])
            per_layer[k] = max(0.0, (1.0 - density) / s_final)
    else:
        raise ValueError(f"unknown distribution {cfg.distribution}")

    def build(path, leaf):
        return per_layer.get(jax.tree_util.keystr(path), 0.0)

    return jax.tree_util.tree_map_with_path(build, params)


def scheduled_sparsity(cfg: PruningConfig, step: jax.Array) -> jax.Array:
    """Cubic ramp from 0 at update_start to final_sparsity at update_end
    (the polynomial schedule used by the reference's jaxpruner recipes)."""
    span = max(1, cfg.update_end - cfg.update_start)
    progress = jnp.clip((step - cfg.update_start) / span, 0.0, 1.0)
    return cfg.final_sparsity * (1.0 - (1.0 - progress) ** 3)


def _block_mask_for_leaf(leaf: jax.Array, sparsity: jax.Array,
                         block_shape) -> jax.Array:
    """Keep the (1 - sparsity) largest-Frobenius-norm tiles of a 2-D
    kernel. Edge tiles (non-divisible dims) are scored on their actual
    content (zero padding adds nothing to the norm)."""
    bk, bn = block_shape
    k, n = leaf.shape
    kt, nt = -(-k // bk), -(-n // bn)
    pad = jnp.pad(leaf.astype(jnp.float32),
                  ((0, kt * bk - k), (0, nt * bn - n)))
    tiles = pad.reshape(kt, bk, nt, bn)
    score = jnp.sum(tiles * tiles, axis=(1, 3)).reshape(-1)  # (kt*nt,)
    order = jnp.sort(score)
    m = score.shape[0]
    cut = jnp.clip((sparsity * m).astype(jnp.int32), 0, m - 1)
    thr = order[cut]
    keep = (score >= jnp.where(cut > 0, thr, -jnp.inf)).reshape(kt, nt)
    mask = jnp.broadcast_to(keep[:, None, :, None], (kt, bk, nt, bn))
    return mask.reshape(kt * bk, nt * bn)[:k, :n].astype(leaf.dtype)


def _mask_for_leaf(leaf: jax.Array, sparsity: jax.Array) -> jax.Array:
    """Keep the (1 - sparsity) largest-magnitude entries. Static shapes:
    uses a sorted-magnitude threshold indexed by the (traced) sparsity."""
    flat = jnp.abs(leaf.reshape(-1))
    order = jnp.sort(flat)  # ascending
    n = flat.shape[0]
    k = jnp.clip((sparsity * n).astype(jnp.int32), 0, n - 1)
    threshold = order[k]
    keep = jnp.abs(leaf) >= jnp.where(k > 0, threshold, -jnp.inf)
    return keep.astype(leaf.dtype)


@dataclasses.dataclass
class MagnitudePruner:
    """Stateless driver; masks are an external pytree (in the TrainState)."""

    cfg: PruningConfig
    relative_sparsity: Optional[PyTree] = None  # filled by init_masks

    def init_masks(self, params: PyTree) -> PyTree:
        self.relative_sparsity = sparsity_distribution(params, self.cfg)
        return jax.tree_util.tree_map(jnp.ones_like, params)

    def update_masks(self, params: PyTree, masks: PyTree,
                     step: jax.Array) -> PyTree:
        """Recompute masks if the schedule says so at ``step`` (jittable;
        the caller host-gates dispatch to due steps)."""
        if not self.cfg.enabled:
            return masks
        if self.cfg.structure == "state":
            return self._update_state_masks(params, masks, step)
        if self.relative_sparsity is None:
            self.relative_sparsity = sparsity_distribution(params, self.cfg)
        s_global = scheduled_sparsity(self.cfg, step)
        due = jnp.logical_and(
            step >= self.cfg.update_start,
            jnp.logical_and(step <= self.cfg.update_end,
                            (step - self.cfg.update_start)
                            % self.cfg.update_freq == 0))

        def new_mask(leaf, mask, rel):
            if rel == 0.0:
                return mask
            s_layer = jnp.clip(s_global * rel, 0.0, 0.999)
            if self.cfg.structure == "block":
                return lax.cond(
                    due,
                    lambda: _block_mask_for_leaf(leaf, s_layer,
                                                 self.cfg.block_shape),
                    lambda: mask)
            return lax.cond(due, lambda: _mask_for_leaf(leaf, s_layer),
                            lambda: mask)

        return jax.tree_util.tree_map(
            new_mask, params, masks, self.relative_sparsity)

    def _update_state_masks(self, params: PyTree, masks: PyTree,
                            step: jax.Array) -> PyTree:
        """Structured state-channel masks: per mixer, channel c is scored
        by ||B̄[c,:]|| * ||C[:,c]|| (its end-to-end contribution through
        the diagonal scan) and the lowest-scored fraction is pruned as a
        WHOLE — B rows and C columns zero together, so the serving engine
        can compact the channel away (engine.state_channel_compaction)."""
        s_global = jnp.clip(scheduled_sparsity(self.cfg, step), 0.0, 0.999)

        def visit(tree, mask_tree):
            if not isinstance(tree, dict):
                return mask_tree
            out = dict(mask_tree)
            if "B" in tree and any(k in tree for k in ("C", "C1", "C2")):
                b = tree["B"]                      # (P, H, 2)
                p = b.shape[0]
                b_score = jnp.sqrt(jnp.sum(b.astype(jnp.float32) ** 2,
                                           axis=(1, 2)))
                c_sq = jnp.zeros((p,), jnp.float32)
                for ck in ("C", "C1", "C2"):
                    if ck in tree:
                        c = tree[ck]               # (H, P[, *2 bidir], 2)
                        cs = jnp.sum(c.astype(jnp.float32) ** 2,
                                     axis=(0, 2))
                        # bidirectional concat doubles the channel axis
                        if cs.shape[0] == 2 * p:
                            cs = cs[:p] + cs[p:]
                        c_sq = c_sq + cs
                score = b_score * jnp.sqrt(c_sq)
                order = jnp.sort(score)
                k = jnp.clip((s_global * p).astype(jnp.int32), 0, p - 1)
                thr = order[k]
                keep = score >= jnp.where(k > 0, thr, -jnp.inf)  # (P,)
                out["B"] = jnp.broadcast_to(
                    keep[:, None, None], b.shape).astype(b.dtype)
                for ck in ("C", "C1", "C2"):
                    if ck in tree:
                        c = tree[ck]
                        ck_keep = keep
                        if c.shape[1] == 2 * p:
                            ck_keep = jnp.concatenate([keep, keep])
                        out[ck] = jnp.broadcast_to(
                            ck_keep[None, :, None], c.shape).astype(c.dtype)
            for key, sub in tree.items():
                if isinstance(sub, dict):
                    out[key] = visit(sub, mask_tree[key])
            return out

        return visit(params, masks)

    def apply_masks(self, params: PyTree, masks: PyTree) -> PyTree:
        """Masked forward weights. STE mode: gradient of identity."""
        if not self.cfg.enabled:
            return params

        def apply(p, m):
            masked = p * m
            if self.cfg.mode == "ste":
                return p + lax.stop_gradient(masked - p)
            return masked

        return jax.tree_util.tree_map(apply, params, masks)

    def post_gradient_update(self, params: PyTree, masks: PyTree) -> PyTree:
        """In hard mode, zero pruned params after the optimizer step (the
        reference's post_gradient_update hook). STE keeps params dense."""
        if not self.cfg.enabled or self.cfg.mode == "ste":
            return params
        return jax.tree_util.tree_map(lambda p, m: p * m, params, masks)


def summarize_sparsity(params: PyTree, masks: Optional[PyTree] = None) -> dict:
    """Fraction of exact zeros per leaf + global, like jaxpruner's
    summarize_sparsity (used at train_helpers.py:777-781)."""
    tree = (jax.tree_util.tree_map(lambda p, m: p * m, params, masks)
            if masks is not None else params)
    flat = jax.tree_util.tree_leaves_with_path(tree)
    out = {}
    total_zero, total = 0, 0
    for path, leaf in flat:
        nz = int(jnp.sum(leaf == 0))
        out[jax.tree_util.keystr(path)] = nz / leaf.size
        total_zero += nz
        total += leaf.size
    out["_total_sparsity"] = total_zero / max(1, total)
    return out
