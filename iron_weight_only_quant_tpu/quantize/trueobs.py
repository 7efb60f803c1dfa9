"""TrueOBS solver (C21 variant solver capability, re-designed for XLA).

The reference vendors a TrueOBS variant of the OBS/GPTQ family inside its
zero-shot harness (gptq/zeroShot/models/fast_trueobs.py:17-176).  Relative
to plain GPTQ it adds:

  * ``sparseout`` -- per-element outlier escape: any weight whose squared
    quantization error exceeds ``0.25 * scale^2`` is kept at full precision
    (its loss is zeroed and no rounding error is propagated for it),
    yielding a dense-codes + sparse-fp-outliers decomposition
    (fast_trueobs.py:108,134-139);
  * ``nearest`` -- skip Hessian error propagation entirely, i.e. plain RTN
    rounding but with the same loss accounting (fast_trueobs.py:142-150);
  * per-element OBS loss tracking ``(w - q)^2 / (2 d^2)``
    (fast_trueobs.py:132,147).

Quantizer params are found ONCE on the full weight matrix up-front
(per-row min/max grid, fast_trueobs.py:72-73) -- TrueOBS has no per-group
scale refresh.

XLA design: identical skeleton to :func:`gptq.gptq_quantize` -- a
``lax.fori_loop`` over columns inside statically-unrolled 128-column
blocks, one dense matmul of cross-block propagation per block.  The
sparse-outlier select is a lane-wise ``jnp.where`` (free on the VPU), so
``sparseout`` costs nothing over the base solve.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .gptq import _find_params, _quantize_col


class TrueOBSResult(NamedTuple):
    q: jnp.ndarray            # dequantized weights [rows, cols] f32 (with fp outliers)
    codes: jnp.ndarray        # integer codes [rows, cols] int32 (invalid at outliers)
    outliers: jnp.ndarray     # bool [rows, cols]: True where q is the original fp weight
    scale: jnp.ndarray        # [rows] f32
    zero: jnp.ndarray         # [rows] f32
    losses: jnp.ndarray       # [rows, cols] f32: (w-q)^2 / (2 d^2), 0 at outliers
    outlier_fraction: jnp.ndarray  # scalar f32 (reference prints tot/numel)


@partial(
    jax.jit,
    static_argnames=("bits", "sym", "blocksize", "percdamp", "mse",
                     "sparseout", "nearest"),
)
def trueobs_quantize(
    w: jnp.ndarray,  # [rows, cols] f32 -- [out, in] orientation
    h: jnp.ndarray,  # [cols, cols] f32 accumulated Hessian
    *,
    bits: int = 4,
    sym: bool = False,
    blocksize: int = 128,
    percdamp: float = 0.01,
    mse: bool = False,
    sparseout: bool = False,
    nearest: bool = False,
) -> TrueOBSResult:
    rows, cols = w.shape
    maxq = float(2**bits - 1)
    w = w.astype(jnp.float32)
    h = h.astype(jnp.float32)

    # quantizer params once, on the full matrix (fast_trueobs.py:72-73)
    scale, zero = _find_params(w, bits, sym, mse)
    outlier_thresh = 0.25 * scale**2  # fast_trueobs.py:108

    # dead columns (fast_trueobs.py:93-95)
    dead = jnp.diag(h) == 0
    h = h + jnp.diag(jnp.where(dead, 1.0, 0.0))
    w = jnp.where(dead[None, :], 0.0, w)

    # damped Cholesky inverse, upper factor (fast_trueobs.py:100-106)
    damp = percdamp * jnp.mean(jnp.diag(h))
    h = h + damp * jnp.eye(cols)
    chol = jax.scipy.linalg.cho_factor(h, lower=True)
    hinv_full = jax.scipy.linalg.cho_solve(chol, jnp.eye(cols))
    hinv = jnp.linalg.cholesky(hinv_full).T  # upper: Hinv = U^T U

    q_out = jnp.zeros_like(w)
    codes_out = jnp.zeros_like(w)
    outlier_out = jnp.zeros(w.shape, jnp.bool_)
    losses_out = jnp.zeros_like(w)

    for i1 in range(0, cols, blocksize):
        i2 = min(i1 + blocksize, cols)
        count = i2 - i1
        w1 = w[:, i1:i2]
        hinv1 = hinv[i1:i2, i1:i2]
        in_block = jnp.arange(count)

        def body(i, carry):
            w1, q1, c1, o1, l1, err1 = carry
            wcol = jax.lax.dynamic_slice(w1, (0, i), (rows, 1))[:, 0]
            d = jax.lax.dynamic_index_in_dim(jnp.diag(hinv1), i, keepdims=False)
            qcol, code = _quantize_col(wcol, scale, zero, maxq)
            loss = (wcol - qcol) ** 2 / d**2
            if sparseout:
                sel = (wcol - qcol) ** 2 > outlier_thresh
                loss = jnp.where(sel, 0.0, loss)
                qcol = jnp.where(sel, wcol, qcol)
            else:
                sel = jnp.zeros_like(wcol, jnp.bool_)
            err = (wcol - qcol) / d
            if not nearest:
                hrow = jax.lax.dynamic_slice(hinv1, (i, 0), (1, count))[0]
                upd = err[:, None] * (hrow[None, :] * (in_block >= i)[None, :])
                w1 = w1 - upd
            q1 = jax.lax.dynamic_update_slice(q1, qcol[:, None], (0, i))
            c1 = jax.lax.dynamic_update_slice(c1, code[:, None], (0, i))
            o1 = jax.lax.dynamic_update_slice(o1, sel[:, None], (0, i))
            l1 = jax.lax.dynamic_update_slice(l1, loss[:, None], (0, i))
            err1 = jax.lax.dynamic_update_slice(err1, err[:, None], (0, i))
            return w1, q1, c1, o1, l1, err1

        init = (
            w1, jnp.zeros_like(w1), jnp.zeros_like(w1),
            jnp.zeros(w1.shape, jnp.bool_), jnp.zeros_like(w1),
            jnp.zeros_like(w1),
        )
        w1, q1, c1, o1, l1, err1 = jax.lax.fori_loop(0, count, body, init)
        q_out = q_out.at[:, i1:i2].set(q1)
        codes_out = codes_out.at[:, i1:i2].set(c1)
        outlier_out = outlier_out.at[:, i1:i2].set(o1)
        losses_out = losses_out.at[:, i1:i2].set(l1 / 2.0)  # fast_trueobs.py:147
        if not nearest:
            w = w.at[:, i2:].add(-(err1 @ hinv[i1:i2, i2:]))

    return TrueOBSResult(
        q_out, codes_out.astype(jnp.int32), outlier_out, scale, zero,
        losses_out, jnp.mean(outlier_out.astype(jnp.float32)),
    )
