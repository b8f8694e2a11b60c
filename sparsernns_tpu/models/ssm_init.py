"""HiPPO-LegS -> NPLR -> DPLR initialization for S5 state matrices.

Standard S5 initialization math (as in the reference's
`sparseRNNs/model/ssm_init.py`, which follows annotated-s4). TPU-first
notes: the eigendecomposition runs on host CPU (`eigh` of a skew-Hermitian
matrix is tiny and XLA:TPU has no eigh), and the results land on whatever
the caller's default device/sharding is — we do NOT hardcode a device hop
like the reference's cpu->"gpu" transfer (ssm_init.py:65-70).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def make_hippo(n: int) -> np.ndarray:
    """N x N HiPPO-LegS matrix (negated)."""
    p = np.sqrt(1 + 2 * np.arange(n))
    a = p[:, None] * p[None, :]
    a = np.tril(a) - np.diag(np.arange(n))
    return -a


def make_nplr_hippo(n: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """HiPPO plus the rank-1 term and input matrix for NPLR form."""
    hippo = make_hippo(n)
    p = np.sqrt(np.arange(n) + 0.5)
    b = np.sqrt(2 * np.arange(n) + 1.0)
    return hippo, p, b


def make_dplr_hippo(n: int):
    """DPLR (diagonal plus low-rank) decomposition of HiPPO-LegS.

    Returns (Lambda, P, B, V, B_orig) with Lambda the complex eigenvalues,
    V the eigenvectors. Computed in numpy on host — this runs once at model
    init and must not end up inside a jit trace.
    """
    a, p, b = make_nplr_hippo(n)
    s = a + p[:, None] * p[None, :]
    s_diag = np.diagonal(s)
    lambda_real = np.mean(s_diag) * np.ones_like(s_diag)
    # S is normal: diagonalize the Hermitian matrix S * -1j.
    lambda_imag, v = np.linalg.eigh(s * -1j)
    p_out = v.conj().T @ p
    b_out = v.conj().T @ b
    return lambda_real + 1j * lambda_imag, p_out, b_out, v, b


def _block_diag(blocks):
    n = len(blocks)
    r, c = blocks[0].shape
    out = np.zeros((n * r, n * c), dtype=blocks[0].dtype)
    for i, blk in enumerate(blocks):
        out[i * r:(i + 1) * r, i * c:(i + 1) * c] = blk
    return out


def blocked_dplr_init(ssm_size: int, blocks: int, conj_sym: bool = True):
    """Block-diagonal HiPPO init, the library-level version of the inline
    setup in reference train.py:97-111.

    Args:
      ssm_size: total state size before conj-sym halving.
      blocks: number of HiPPO blocks on the diagonal.
      conj_sym: keep only half of each conjugate-symmetric spectrum; the
        effective state size P becomes ssm_size // 2.

    Returns:
      dict with Lambda (complex (P,)), V ((ssm_size, P) complex),
      Vinv ((P, ssm_size) complex), and P (the effective state size).
    """
    block_size = ssm_size // blocks
    lam, _, _, v, _ = make_dplr_hippo(block_size)
    if conj_sym:
        block_size_eff = block_size // 2
        ssm_size_eff = ssm_size // 2
    else:
        block_size_eff = block_size
        ssm_size_eff = ssm_size
    lam = lam[:block_size_eff]
    v = v[:, :block_size_eff]
    vc = v.conj().T
    lam_full = (lam * np.ones((blocks, block_size_eff))).ravel()
    v_full = _block_diag([v] * blocks)
    vinv_full = _block_diag([vc] * blocks)
    # HOST numpy on purpose — never device_put the complex eigenvector
    # matrices. The device program only ever sees the f32 real-pair
    # params derived from these; an eager complex64 transfer here is
    # pure waste AND is refused (async, surfacing at the next sync) by
    # conformance-limited TPU transports — convicted 2026-08-20 as the
    # root cause of every "model program refused UNIMPLEMENTED" probe
    # failure (runs/jaxpr_bisect.json, ladder in PERF.md).
    # complex64 at the boundary: numpy eigh computes in complex128, but
    # the params derived from these were always c64 (the pre-round-4
    # jnp.asarray did the same truncation) — keep numerics identical.
    return {
        "Lambda": lam_full.astype(np.complex64),
        "V": v_full.astype(np.complex64),
        "Vinv": vinv_full.astype(np.complex64),
        "P": ssm_size_eff,
    }


def log_step_initializer(dt_min: float = 0.001, dt_max: float = 0.1):
    """Sample log-uniform timescales in [dt_min, dt_max]."""

    def init(key, shape):
        u = jax.random.uniform(key, shape)
        return u * (jnp.log(dt_max) - jnp.log(dt_min)) + jnp.log(dt_min)

    return init


def init_log_steps(key, shape_and_range):
    """(P, dt_min, dt_max) -> (P, 1) log-timescales, one key per channel
    (matches reference init_log_steps ssm_init.py:103-119 structure)."""
    p, dt_min, dt_max = shape_and_range
    keys = jax.random.split(key, p)
    init = log_step_initializer(dt_min, dt_max)
    return jax.vmap(lambda k: init(k, (1,)))(keys)


def init_vinv_b(init_fun, rng, shape, vinv):
    """Sample B in the original basis, project by Vinv, return as
    (P, H, 2) real-pair parameterization.

    The projection runs as two REAL matmuls against host-precomputed
    Re/Im parts of Vinv — ``model.init`` stays complex-free on device
    (complex64 is not MXU-native, and conformance-limited TPU
    transports refuse complex programs outright; the framework's
    complex-as-real-pairs rule applies to init too)."""
    b = init_fun(rng, shape).astype(jnp.float32)
    vinv_re = np.ascontiguousarray(np.real(vinv), np.float32)
    vinv_im = np.ascontiguousarray(np.imag(vinv), np.float32)
    return jnp.stack([vinv_re @ b, vinv_im @ b], axis=-1)


def init_cv(init_fun, rng, shape, v):
    """Sample complex C as (H, P_orig, 2), project by V, return (H, P, 2).

    Real-pair projection (see init_vinv_b): for c = cr + i·ci and
    V = Vr + i·Vi, cV = (cr@Vr − ci@Vi) + i·(cr@Vi + ci@Vr)."""
    c_ = init_fun(rng, shape).astype(jnp.float32)
    cr, ci = c_[..., 0], c_[..., 1]
    v_re = np.ascontiguousarray(np.real(v), np.float32)
    v_im = np.ascontiguousarray(np.imag(v), np.float32)
    return jnp.stack([cr @ v_re - ci @ v_im, cr @ v_im + ci @ v_re],
                     axis=-1)


def trunc_standard_normal(key, shape):
    """Per-row truncated-normal sample of C, shape (H, P, 2)."""
    h, p, _ = shape
    keys = jax.random.split(key, h)
    init = jax.nn.initializers.lecun_normal()
    return jax.vmap(lambda k: init(k, (1, p, 2))[0])(keys)
