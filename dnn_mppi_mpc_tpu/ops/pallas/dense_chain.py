"""Weight-streaming dense-chain kernel: a whole folded ResNet per launch.

The ResNet-50 learned-dynamics MPPI row is per-op-launch-bound (docs/PERF.md
round 5): at L=1 the net is 53 sequential matmuls per rollout step, and with
T=25 steps per solve the ~1 325 small XLA ops cost ~3 µs each — 4 ms/solve
with the MXU mostly idle. This kernel replaces the 53 ops of ONE net
evaluation with ONE Pallas launch:

* the folded weights (models/learned.fold_resnet1d_l1_arrays) live in HBM
  as bf16, channel dims padded to lane multiples, each matrix stored with
  its SMALLER dim on sublanes (transposed when c_in > c_out) so one
  (1024, 2048) VMEM scratch pair covers every layer;
* the kernel walks the residual-block structure with the activations as
  in-register/VMEM values (bf16 between layers, f32 matmul accumulation)
  while DOUBLE-BUFFERED async DMA streams the next layer's weights
  HBM → VMEM behind the current matmul — the per-solve floor becomes the
  weight traffic (≈ T · 16 MB bf16 at 820 GB/s ≈ 0.5 ms) plus the MXU
  time, not 1 325 op launches;
* biases ride in one packed (n_layers, C_MAX) f32 VMEM input; the tanh
  head's 3 real outputs come back in a padded 128-lane block.

The grid partitions the sample batch into ``b_block``-row slabs (weights
are re-streamed per slab — pick b_block to cover the batch in one or two
slabs). bf16 weights/activations are a measured-accuracy tradeoff for a
*learned residual regressor* (outputs in [-1, 1] via tanh): parity vs the
f32 XLA fold is gated at 2e-2 absolute in tests/test_resnet_dynamics.py.

MEASURED RESULT (round 5, TPU v5e, K=1024, ResNet-50): 0.32 ms per net
evaluation — parity 5.5e-3 vs the f32 fold, but 2× SLOWER than letting XLA
run the 53 matmuls as individual ops (~0.15 ms/eval inside the MPPI
solve). The one-deep prefetch with per-layer synchronous waits plus the
underutilized small stage-1 layers loses to XLA's own op-stream
scheduling, which overlaps weight fetches and compute across many ops in
flight. Kept in-tree as tested infrastructure (the manual double-buffered
HBM→VMEM DMA pattern, transposed-storage matmul paths, CI-covered in
interpret mode) and as the honest record that BOTH directions — op-fusion
and op-streaming — have now been measured for this workload; the next real
lever would be multi-slot prefetch + packing the small stage-1 layers into
one block-diagonal matmul, with the HBM floor at ~80 µs/eval.

Reference nets being served: dnn/resnet18.py:31-69, dnn/resnet50.py:44-105
as deployed through l4casadi in mpc_racecar_dnn.py / the flagship DNN sim.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _pad_c(c: int) -> int:
    return max(LANES, -(-c // LANES) * LANES)


def _prep_layers(stem, blocks, head):
    """Flatten the folded structure into a layer list + block program.

    Each layer entry: dict(W=(a, b) bf16 HBM array [possibly transposed],
    bias=(c_out_p,) f32, transposed=bool, c_in_p, c_out_p). The block
    program references layers by index so the kernel builder can unroll.
    """
    layers = []

    def add(W, b):
        c_in, c_out = W.shape
        ci, co = _pad_c(c_in), _pad_c(c_out)
        Wp = np.zeros((ci, co), np.float32)
        Wp[:c_in, :c_out] = np.asarray(W, np.float32)
        bp = np.zeros((co,), np.float32)
        bp[:c_out] = np.asarray(b, np.float32)
        transposed = ci > co
        if transposed:
            Wp = Wp.T  # stored (co, ci): smaller dim on sublanes
        layers.append(
            dict(
                W=jnp.asarray(Wp, jnp.bfloat16),
                bias=bp,
                transposed=transposed,
                c_in_p=ci,
                c_out_p=co,
            )
        )
        return len(layers) - 1

    program = {"stem": add(*stem), "blocks": [], "head": None}
    for convs, down in blocks:
        entry = {
            "convs": [add(*c) for c in convs],
            "down": add(*down) if down is not None else None,
        }
        program["blocks"].append(entry)
    program["head"] = add(*head)
    return layers, program


def make_resnet_chain_fn(
    model,
    variables,
    b_block: int = 512,
    interpret: bool = False,
):
    """Bind a folded ResNet1D into a single-launch (B, C) → (B, out) callable.

    ``model``/``variables`` as for ``models.learned.fold_resnet1d_l1``; the
    returned function pads its input batch to a ``b_block`` multiple and its
    features/outputs to lane multiples internally.
    """
    from ...models.learned import fold_resnet1d_l1_arrays

    stem, blocks, head = fold_resnet1d_l1_arrays(model, variables)
    layers, program = _prep_layers(stem, blocks, head)
    n_layers = len(layers)
    out_dim = head[0].shape[1]
    c_in_real = stem[0].shape[0]
    C_IN = layers[program["stem"]]["c_in_p"]
    C_MAX = max(max(l["c_in_p"], l["c_out_p"]) for l in layers)
    # weight scratch: smaller dim on sublanes → (C_MAX//2, C_MAX) covers
    # every stored matrix unless some layer is square at C_MAX
    A_MAX = max(min(l["c_in_p"], l["c_out_p"]) for l in layers)
    biases = np.zeros((n_layers, C_MAX), np.float32)
    for i, l in enumerate(layers):
        biases[i, : l["bias"].shape[0]] = l["bias"]
    biases = jnp.asarray(biases)

    def kernel(x_ref, bias_ref, *refs):
        w_refs = refs[:n_layers]
        out_ref = refs[n_layers]
        w_scr = (refs[n_layers + 1], refs[n_layers + 2])
        sems = refs[n_layers + 3]

        def stored_shape(i):
            l = layers[i]
            a, b = l["c_in_p"], l["c_out_p"]
            return (b, a) if l["transposed"] else (a, b)

        def start(i, slot):
            sa, sb = stored_shape(i)
            pltpu.make_async_copy(
                w_refs[i], w_scr[slot].at[0:sa, 0:sb], sems.at[slot]
            ).start()

        def wait(i, slot):
            sa, sb = stored_shape(i)
            pltpu.make_async_copy(
                w_refs[i], w_scr[slot].at[0:sa, 0:sb], sems.at[slot]
            ).wait()

        def matmul(h, i, slot):
            """h (B, c_in_p) bf16 @ layer i → (B, c_out_p) f32 + bias."""
            l = layers[i]
            sa, sb = stored_shape(i)
            w = w_scr[slot][0:sa, 0:sb]
            if l["transposed"]:
                # stored (c_out_p, c_in_p): contract over both lane dims
                y = jax.lax.dot_general(
                    h, w, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:
                y = jax.lax.dot_general(
                    h, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            return y + bias_ref[i, 0 : l["c_out_p"]][None, :]

        # issue DMAs in ping-pong order; layer order is the execution order
        order = [program["stem"]]
        for blk in program["blocks"]:
            if blk["down"] is not None:
                order.append(blk["down"])
            order.extend(blk["convs"])
        order.append(program["head"])

        # buffers ping-pong by EXECUTION position (layer indices don't
        # alternate parity through the down-before-convs ordering)
        pos = {layer_idx: k for k, layer_idx in enumerate(order)}
        start(order[0], 0)

        def step(i):
            """Wait for layer i's weights; prefetch the next in order.

            Position k's weights sit in slot k%2; the prefetch of k+1 into
            slot (k+1)%2 overlaps position k's matmul, and that slot's
            previous occupant (position k−1) was fully consumed before this
            point in program order.
            """
            k = pos[i]
            wait(i, k % 2)
            if k + 1 < len(order):
                start(order[k + 1], (k + 1) % 2)
            return k % 2

        bf = jnp.bfloat16
        h = x_ref[...].astype(bf)
        i = program["stem"]
        h = jax.nn.relu(matmul(h, i, step(i))).astype(bf)
        for blk in program["blocks"]:
            if blk["down"] is not None:
                i = blk["down"]
                r = matmul(h, i, step(i))
            else:
                r = h.astype(jnp.float32)
            y = h
            for c, i in enumerate(blk["convs"]):
                y2 = matmul(y, i, step(i))
                if c < len(blk["convs"]) - 1:
                    y = jax.nn.relu(y2).astype(bf)
                else:
                    y2f = y2
            h = jax.nn.relu(y2f + r).astype(bf)
        i = program["head"]
        out_ref[...] = jnp.tanh(matmul(h, i, step(i))).astype(jnp.float32)

    # DMA re-issued per buffer with matching shape for wait(): Mosaic
    # matches start/wait by (src, dst, sem) descriptor, so the wait
    # re-creates the same descriptor (pattern from the pallas guide).

    OUT_P = layers[program["head"]]["c_out_p"]

    @functools.partial(jax.jit, static_argnames=())
    def run(xp: jnp.ndarray) -> jnp.ndarray:
        B = xp.shape[0]
        grid = (B // b_block,)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((b_block, C_IN), lambda b: (b, 0)),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # biases
            ]
            + [pl.BlockSpec(memory_space=pltpu.ANY) for _ in range(n_layers)],
            out_specs=pl.BlockSpec((b_block, OUT_P), lambda b: (b, 0)),
            out_shape=jax.ShapeDtypeStruct((B, OUT_P), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((A_MAX, C_MAX), jnp.bfloat16),
                pltpu.VMEM((A_MAX, C_MAX), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(xp, biases, *[l["W"] for l in layers])

    def f(x: jnp.ndarray) -> jnp.ndarray:
        B = x.shape[0]
        Bp = -(-B // b_block) * b_block
        xp = (
            jnp.zeros((Bp, C_IN), jnp.float32)
            .at[:B, : x.shape[1]]
            .set(x.astype(jnp.float32))
        )
        out = run(xp)
        return out[:B, :out_dim]

    f.c_in = c_in_real
    f.n_layers = n_layers
    return f


__all__ = ["make_resnet_chain_fn"]
