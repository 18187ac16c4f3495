"""Fused residual-MLP dynamics step: the whole network in one Pallas launch.

The scan-path MPPI engine calls ``dynamics_step`` on ``(K, nx)`` sample
batches once per rollout step (solvers/mppi.py::mppi_step). With a learned
residual (models/learned.py ``MLP`` — the reference's dnn/simple_mlp.py:5-24),
XLA executes each Dense layer as a separate HLO, so the ``(K, hidden)``
activations round-trip HBM between layers several times per rollout step —
for deployment-size residual nets that traffic, not the matmul FLOPs, is the
bottleneck. This kernel keeps the whole layer chain resident in VMEM: one
launch per K-block computes

    dt · out_scaler⁻¹( MLP( in_scaler(feats) ) )

with the standardizers (models/learned.py ``Standardizer``) and the Euler dt
folded into the first/last layer weights (both maps are affine, so folding is
exact up to float reassociation). The MXU runs the matmuls
(``preferred_element_type=f32``); the VPU runs the tanh epilogues in VMEM.

Provenance: this is the TPU deployment path for the reference's
l4casadi-generated C++ MLP shim
(_l4c_generated/learned_dynamics_differential_drive.cpp:39-52, composed into
f_expl at simulation/bullet_differential_drive_dnn.py:88-92). There the net
runs per acados SQP iteration on the host; here it runs K-sample-batched
inside the MPPI rollout.

Padding rules: every feature dimension is zero-padded to a multiple of 128
lanes (zero weight rows/cols and zero biases are exact no-ops through tanh,
since tanh(0)=0 feeds zero rows of the next layer), and the sample dimension
is zero-padded to a multiple of the row block (padded rows are computed and
discarded). The kernel therefore accepts any (K, F) problem, with waste only
in the pads.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ...models.integrators import euler_step

LANES = 128


def _ceil_to(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _mlp_kernel(x_ref, *refs, n_layers: int, compute_dtype):
    """(B, F0p) block through the folded Dense chain, all layers in VMEM.

    ``refs`` = [W_0, b_0, …, W_{L-1}, b_{L-1}, out]. tanh is applied after
    layers 1…L-2 — the reference MLP's activation pattern
    (dnn/simple_mlp.py:19-22: linear input layer, tanh hidden layers, linear
    head; models/learned.py::MLP matches it).
    """
    out_ref = refs[-1]
    h = x_ref[:, :]
    for i in range(n_layers):
        w = refs[2 * i][:, :]
        b = refs[2 * i + 1][:, :]
        h = (
            jnp.dot(
                h.astype(compute_dtype),
                w.astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )
            + b
        )
        if 1 <= i <= n_layers - 2:
            h = jnp.tanh(h)
    out_ref[:, :] = h


def fused_mlp_apply(
    feats: jnp.ndarray,
    weights: Sequence[jnp.ndarray],
    biases: Sequence[jnp.ndarray],
    *,
    block_rows: int = 512,
    compute_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Apply a Dense chain (linear, tanh×(L−2), linear) to ``feats (K, F0)``.

    One Pallas launch per ``block_rows`` samples; every weight matrix stays in
    VMEM for the whole block, so inter-layer activations never touch HBM.
    ``compute_dtype=jnp.bfloat16`` runs the matmuls in bf16 with f32
    accumulation (the MXU's native fast path); f32 by default for parity.
    """
    K, F0 = feats.shape
    n_layers = len(weights)
    assert len(biases) == n_layers and n_layers >= 1
    assert weights[0].shape[0] == F0, (
        f"feats have {F0} features, first layer expects {weights[0].shape[0]}"
    )
    for i in range(n_layers - 1):
        assert weights[i].shape[1] == weights[i + 1].shape[0], (
            f"layer {i}→{i + 1} width mismatch"
        )
    out_dim = weights[-1].shape[1]

    # Lane-pad every feature dimension (exact: zero rows/cols, tanh(0)=0).
    dims = [F0] + [w.shape[1] for w in weights]
    dims_p = [_ceil_to(d, LANES) for d in dims]
    w_p = [
        jnp.pad(
            w.astype(jnp.float32),
            ((0, dims_p[i] - dims[i]), (0, dims_p[i + 1] - dims[i + 1])),
        )
        for i, w in enumerate(weights)
    ]
    b_p = [
        jnp.pad(b.astype(jnp.float32), (0, dims_p[i + 1] - dims[i + 1]))[None, :]
        for i, b in enumerate(biases)
    ]

    # Row-pad K to a block multiple (padded rows computed, then sliced off).
    B = max(8, min(block_rows, _ceil_to(K, 8)))
    Kp = _ceil_to(K, B)
    x = jnp.pad(
        feats.astype(jnp.float32), ((0, Kp - K), (0, dims_p[0] - F0))
    )

    kernel = functools.partial(
        _mlp_kernel, n_layers=n_layers, compute_dtype=compute_dtype
    )
    full = lambda i: (0, 0)  # noqa: E731 — weights/biases: one whole block
    in_specs = [pl.BlockSpec((B, dims_p[0]), lambda i: (i, 0))]
    args = [x]
    for w, b in zip(w_p, b_p):
        in_specs.append(pl.BlockSpec(w.shape, full))
        in_specs.append(pl.BlockSpec(b.shape, full))
        args += [w, b]

    out = pl.pallas_call(
        kernel,
        grid=(Kp // B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((B, dims_p[-1]), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Kp, dims_p[-1]), jnp.float32),
        interpret=interpret,
    )(*args)
    return out[:K, :out_dim]


def fold_residual_mlp(
    params,
    in_scaler=None,
    out_scaler=None,
    dt: float = 1.0,
) -> Tuple[Tuple[jnp.ndarray, ...], Tuple[jnp.ndarray, ...]]:
    """Fold standardizers and the Euler dt into the MLP's Dense weights.

    ``in_scaler.transform`` (z = (f − μ)/σ) folds into layer 0:
    W₀′ = W₀/σ[:,None], b₀′ = b₀ − (μ/σ)·W₀. ``out_scaler.inverse``
    (y = h·σₒ + μₒ) and the Euler dt fold into the head:
    Wₕ′ = Wₕ·σₒ·dt, bₕ′ = (bₕ·σₒ + μₒ)·dt. Exact up to float reassociation
    (both maps are affine) — this is the same in-graph scaler folding the
    reference validates at test/test_diff_dyna_eval.py:50-56, pushed one
    level further into the weights.

    ``params`` is the Flax variable dict of models/learned.py::MLP
    (Dense_0 … Dense_{depth+1}).
    """
    p = params.get("params", params)
    names = sorted(
        (n for n in p if n.startswith("Dense_")), key=lambda n: int(n.split("_")[1])
    )
    assert names, "no Dense_* layers found — expected a models.learned.MLP tree"
    ws = [jnp.asarray(p[n]["kernel"], jnp.float32) for n in names]
    bs = [jnp.asarray(p[n]["bias"], jnp.float32) for n in names]

    if in_scaler is not None:
        mu = jnp.asarray(in_scaler.mean, jnp.float32)
        sd = jnp.asarray(in_scaler.std, jnp.float32)
        bs[0] = bs[0] - (mu / sd) @ ws[0]
        ws[0] = ws[0] / sd[:, None]
    scale = jnp.float32(dt)
    if out_scaler is not None:
        so = jnp.asarray(out_scaler.std, jnp.float32)
        mo = jnp.asarray(out_scaler.mean, jnp.float32)
        bs[-1] = (bs[-1] * so + mo) * scale
        ws[-1] = ws[-1] * (so[None, :] * scale)
    else:
        ws[-1] = ws[-1] * scale
        bs[-1] = bs[-1] * scale
    return tuple(ws), tuple(bs)


def make_fused_residual_step(
    analytic: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    params,
    dt: float,
    in_scaler=None,
    out_scaler=None,
    *,
    block_rows: int = 512,
    compute_dtype=jnp.float32,
    interpret: bool = False,
    residual_scale: Optional[float] = None,
) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Batched discrete step x⁺ = euler(analytic) + s·residual_MLP(x, u).

    Drop-in ``dynamics_step`` for the MPPI scan engine — numerically the
    Euler discretization of models/dynamics.py::residual_dynamics with
    models/learned.py::make_residual_fn, but the whole MLP runs as one fused
    Pallas launch per rollout step (module docstring). Euler-only by
    construction: the residual scale s is folded into the head weights.
    ``residual_scale`` defaults to ``dt`` (the net predicts a continuous-time
    rate, models/dynamics.py::residual_dynamics); pass ``1.0`` when the net
    was trained on discrete one-step errors (the convention of
    train/train_diff_mlp.py's dataset — next-state error, not a rate).
    Accepts any leading batch shape (…, nx)/(…, nu), like the scan path's
    dynamics_step contract.
    """
    scale = dt if residual_scale is None else residual_scale
    ws, bs = fold_residual_mlp(params, in_scaler, out_scaler, scale)

    def step(x: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
        feats = jnp.concatenate(
            [x.astype(jnp.float32), u.astype(jnp.float32)], axis=-1
        )
        batch = feats.shape[:-1]
        resid = fused_mlp_apply(
            feats.reshape((-1, feats.shape[-1])),
            ws,
            bs,
            block_rows=block_rows,
            compute_dtype=compute_dtype,
            interpret=interpret,
        ).reshape(batch + (ws[-1].shape[1],))
        return euler_step(analytic, x, u, dt) + resid.astype(x.dtype)

    return step


__all__ = ["fused_mlp_apply", "fold_residual_mlp", "make_fused_residual_step"]
