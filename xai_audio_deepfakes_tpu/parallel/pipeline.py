"""Pipeline parallelism over the transformer layer stack.

The reference's only distribution mechanism is DDP (SURVEY §2); the rebuild
already covers data parallelism ('data' axis) and Megatron tensor
parallelism ('model' axis, `parallel/sharding.py`). This module adds the
third axis for the 48-layer XLS-R-2B stack (`EmbedderConfig.xls_r_2b_full`):
GPipe-style pipeline parallelism, expressed TPU-natively as a
`shard_map` + `lax.ppermute` rotation over a 'stage' mesh axis — the
collective-pipelining recipe, not a torch-style stage scheduler:

  * the scanned layer stack's params (leading [L] axis,
    `Wav2Vec2Encoder` with `scan_layers=True`) shard over 'stage', so each
    device holds L/S contiguous layers;
  * the batch splits into M microbatches; each tick every stage runs its
    layer block on its current microbatch and `ppermute`s the activation to
    the next stage over ICI (neighbor hop — the cheapest collective there
    is);
  * after M + S - 1 ticks the last stage has produced every microbatch;
    a masked psum broadcasts the result so the output is replicated over
    'stage' (and stays batch-sharded over 'data').

Composes with the 'data' axis: run on a ('data', 'stage') mesh and the
microbatch tensors shard their batch dim over 'data' while params shard
over 'stage' — dp×pp with zero code changes at the call site.

Also composes with Megatron tensor parallelism ('model' axis,
`parallel/sharding.py`): on a ('data', 'stage', 'model') mesh the
shard_map is *partially manual* — manual over 'data'/'stage' (the
microbatch rotation and ppermute), auto over 'model', so GSPMD applies
the TP layout of the stage-sharded layer kernels
(`embedder_pp_tp_param_specs`) inside the rotation and inserts the
attention/FFN all-reduces itself. dp×pp×tp in one program. Partial-manual
shard_map requires a jit context (enforced by the production entry
points; the eager path raises in JAX otherwise).

Everything is static-shape and trace-once: the tick loop is a `lax.scan`
over the rotation schedule, bubbles are computed (wasted ticks on invalid
microbatches) rather than branched, which is exactly how a TPU wants it —
uniform SPMD program, no data-dependent control flow.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def stack_to_stages(params: dict, n_stages: int) -> dict:
    """[L, ...] stacked layer params -> leading axis ready to shard over
    'stage'. Only validates divisibility; sharding the [L] axis over S
    stages gives each device its contiguous L/S block (GSPMD tiles axis 0
    in order, so stage s holds layers [s*L/S, (s+1)*L/S) — pipeline order
    matches mesh order)."""
    leaves = jax.tree.leaves(params)
    if not leaves:
        raise ValueError("empty layer param tree")
    L = leaves[0].shape[0]
    if L % n_stages:
        raise ValueError(f"{L} layers not divisible by {n_stages} stages")
    return params


def pipeline_apply(
    layer_fn,
    stacked_params: dict,
    x: jax.Array,
    mesh: Mesh,
    *,
    stage_axis: str = "stage",
    data_axis: str | None = "data",
    n_micro: int | None = None,
):
    """Run L stacked layers over x [B, ...] as an S-stage pipeline.

    layer_fn(layer_params, x) -> x applies ONE layer given one [L]-slice of
    `stacked_params`. `n_micro` defaults to S (the minimum that keeps every
    stage busy in steady state; more microbatches shrink the bubble
    fraction (S-1)/(M+S-1) at constant memory here, since microbatch size
    B/M shrinks as M grows).
    """
    S = mesh.shape[stage_axis]
    M = int(n_micro or S)
    B = x.shape[0]
    if B % M:
        raise ValueError(f"batch {B} not divisible by n_micro={M}")
    if data_axis and data_axis in mesh.shape and (B // M) % mesh.shape[data_axis]:
        raise ValueError(
            f"microbatch size {B // M} not divisible by "
            f"{data_axis}={mesh.shape[data_axis]}"
        )

    # [M, B/M, ...] microbatches; batch stays sharded over 'data' if present
    micro = x.reshape((M, B // M) + x.shape[1:])

    data_spec = (
        (data_axis,) if data_axis and data_axis in mesh.shape else (None,)
    )
    micro_spec = P(None, *data_spec, *([None] * (x.ndim - 1)))
    out_spec = micro_spec
    param_spec = jax.tree.map(lambda _: P(stage_axis), stacked_params)

    perm = [(i, (i + 1) % S) for i in range(S)]

    # manual over the rotation axes only; any further mesh axis (e.g.
    # 'model' for tensor parallelism) stays auto so GSPMD partitions the
    # in-stage layer math over it (requires a jit context in JAX)
    manual = {stage_axis} | ({data_axis} if data_axis in mesh.shape else set())
    extra = {"axis_names": manual} if set(mesh.axis_names) - manual else {}

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(param_spec, micro_spec),
        out_specs=out_spec,
        check_vma=False,
        **extra,
    )
    def run(params_block, micro_local):
        # per-device: params_block has leading [L/S]; micro_local is
        # [M, Bm_local, ...]
        stage = jax.lax.axis_index(stage_axis)

        def stage_block(x):
            def body(h, p):
                return layer_fn(p, h), None

            h, _ = jax.lax.scan(body, x, params_block)
            return h

        zero = jnp.zeros_like(micro_local[0])

        def tick(carry, t):
            state, outputs = carry
            # stage 0 ingests microbatch t (clipped; invalid ticks are
            # bubbles whose results are masked out below)
            fed = jax.lax.dynamic_index_in_dim(
                micro_local, jnp.clip(t, 0, M - 1), keepdims=False
            )
            inp = jnp.where(stage == 0, fed, state)
            out = stage_block(inp)
            # last stage finished microbatch m = t - (S - 1)
            m = t - (S - 1)
            valid = (stage == S - 1) & (m >= 0)
            outputs = jax.lax.cond(
                valid,
                lambda o: jax.lax.dynamic_update_index_in_dim(
                    o, out.astype(o.dtype), jnp.clip(m, 0, M - 1), 0
                ),
                lambda o: o,
                outputs,
            )
            state = jax.lax.ppermute(out, stage_axis, perm)
            return (state, outputs), None

        outputs0 = jnp.zeros_like(micro_local)
        (_, outputs), _ = jax.lax.scan(
            tick, (zero, outputs0), jnp.arange(M + S - 1)
        )
        # outputs are populated only on the last stage: masked psum
        # broadcasts them so every stage returns the same (replicated) value.
        # Keep the [M, Bm_local, ...] layout — the global un-microbatch
        # reshape happens OUTSIDE shard_map (reshaping locally would
        # interleave the data-axis shards into the wrong batch order).
        return jax.lax.psum(
            jnp.where(stage == S - 1, outputs, jnp.zeros_like(outputs)),
            stage_axis,
        )

    out = run(stacked_params, micro)
    return out.reshape((B,) + x.shape[1:])


def pipelined_encoder_apply(
    cfg,
    params: dict,
    wav: jax.Array,
    mesh: Mesh,
    *,
    n_micro: int | None = None,
    stage_axis: str = "stage",
    data_axis: str | None = "data",
):
    """Full `Wav2Vec2Encoder` forward with the transformer stack pipelined.

    Matches `Wav2Vec2Encoder(cfg).apply(params, wav)` (the
    `hidden_states[output_layer]` readout, `classifier_embedder.py:13-16` /
    `audioprocessor.py:76-77` semantics) but runs the layer stack as an
    S-stage pipeline over `stage_axis`: the conv frontend / projection /
    pos-conv (~5% of FLOPs at full geometry) run replicated-or-dp as
    GSPMD places them, then the first `output_layer` stacked layers rotate
    through the stages. Requires `scan_layers=True` params (stacked
    [L, ...]) and `output_layer % n_stages == 0`.
    """
    from xai_audio_deepfakes_tpu.models.wav2vec2 import (
        FeatureEncoder,
        FeatureProjection,
        PositionalConvEmbedding,
    )

    p = params["params"] if "params" in params else params
    x = FeatureEncoder(cfg).apply({"params": p["feature_encoder"]}, wav)
    x = FeatureProjection(cfg).apply({"params": p["feature_projection"]}, x)
    x = x + PositionalConvEmbedding(cfg).apply({"params": p["pos_conv"]}, x)

    n_run = min(cfg.output_layer, cfg.num_layers)
    layer_params = jax.tree.map(lambda a: a[:n_run], p["layers"]["layer"])
    x = pipeline_apply(
        encoder_layer_fn(cfg),
        stack_to_stages(layer_params, mesh.shape[stage_axis]),
        x,
        mesh,
        stage_axis=stage_axis,
        data_axis=data_axis,
        n_micro=n_micro,
    )
    if cfg.final_layer_norm:
        import flax.linen as nn

        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32
        ).apply({"params": p["final_ln"]}, x)
    return x.astype(jnp.float32)


def encoder_layer_fn(cfg):
    """layer_fn for `pipeline_apply` wrapping one `EncoderLayer` — pass the
    scanned stack's params subtree (`params['params']['layers']['layer']`,
    leading [L]) as `stacked_params`. Honors `cfg.remat`/`cfg.remat_policy`
    exactly like the non-pipelined `Wav2Vec2Encoder` paths — without it the
    stage scan saves every layer's intermediates for backward and the full-2B
    training step OOMs despite `--remat`."""
    from xai_audio_deepfakes_tpu.models.wav2vec2 import EncoderLayer

    layer = EncoderLayer(cfg)

    def layer_fn(p, x):
        return layer.apply({"params": p}, x)

    if cfg.remat:
        policy = (
            jax.checkpoint_policies.checkpoint_dots
            if cfg.remat_policy == "dots"
            else None
        )
        if cfg.remat_policy not in ("full", "dots"):
            raise ValueError(f"unknown remat_policy: {cfg.remat_policy!r}")
        layer_fn = jax.checkpoint(layer_fn, policy=policy)

    return layer_fn
