"""Multi-chip inference: the serving-side sharding layer.

The reference has no distributed inference at all (eval loops are
single-GPU, `LMAC_metrics.py:117-158`). On TPU, scale-out serving/eval is
the same GSPMD recipe as training: batch shards over the 'data' mesh axis,
the 2B embedder optionally tensor-shards over 'model' (Megatron specs from
`parallel/sharding.py`), and XLA inserts the collectives. One compiled
program per mesh shape; feed it `batch_sharding`-placed arrays and every
chip runs its slice.

    mesh = make_mesh(MeshConfig(model_parallel=2))
    explain, sharded_params = make_sharded_explain(pipe, mesh, params)
    out = explain(sharded_params, device_put(wav, batch_sharding(mesh)))
"""

from __future__ import annotations

import dataclasses

import jax
from jax.sharding import Mesh

from xai_audio_deepfakes_tpu.config import MaskingConvention, MeshConfig
from xai_audio_deepfakes_tpu.parallel.mesh import batch_sharding
from xai_audio_deepfakes_tpu.parallel.sharding import (
    embedder_param_specs,
    embedder_pp_param_specs,
    shard_params,
)


def _pp_stages(mesh: Mesh, stage_axis: str = "stage") -> int:
    return int(mesh.shape.get(stage_axis, 1))


def shard_pipeline_params(
    pipe, params: dict, mesh: Mesh, mesh_cfg: MeshConfig | None = None
) -> dict:
    """Place the full pipeline param tree on the mesh: embedder under its
    tensor-parallel specs ('model' axis) or pipeline specs (layer stack
    over 'stage'), everything else replicated."""
    mesh_cfg = mesh_cfg or pipe.cfg.mesh
    out = {}
    for key, tree in params.items():
        if key == "encoder":
            if _pp_stages(mesh) > 1:
                # dp x pp (x tp when the mesh carries a model axis too:
                # Megatron kernel dims shard over 'model', GSPMD-auto
                # inside the pipeline shard_map)
                specs = embedder_pp_param_specs(
                    tree,
                    _pp_stages(mesh),
                    mesh_cfg=dataclasses.replace(
                        mesh_cfg,
                        model_parallel=int(
                            mesh.shape.get(mesh_cfg.model_axis, 1)
                        ),
                    ),
                )
            else:
                specs = embedder_param_specs(tree, mesh_cfg)
            out[key] = shard_params(tree, mesh, specs)
        else:
            out[key] = shard_params(tree, mesh)
    return out


def make_sharded_explain(
    pipe,
    mesh: Mesh,
    params: dict,
    decoder: str = "unet",
    masking: MaskingConvention | None = None,
    mesh_cfg: MeshConfig | None = None,
):
    """-> (jitted explain fn, mesh-placed params). The batch (leading) axis
    of `wav` shards over 'data'; per-call batch size must be a multiple of
    the data-axis size. Input arrays are committed via `in_shardings`, so
    host numpy batches are accepted directly."""
    mesh_cfg = mesh_cfg or pipe.cfg.mesh
    sharded = shard_pipeline_params(pipe, params, mesh, mesh_cfg)
    data = batch_sharding(mesh, mesh_cfg)

    if _pp_stages(mesh) > 1:
        # pipeline-parallel embedder: the layer stack rotates over 'stage'
        # (shard_map + ppermute, parallel/pipeline.py) inside the one
        # jitted explain graph; everything else stays GSPMD-placed.
        from xai_audio_deepfakes_tpu.parallel.pipeline import (
            pipelined_encoder_apply,
        )

        if not pipe.cfg.embedder.scan_layers:
            raise ValueError(
                "pipeline-parallel explain needs scan_layers=True "
                "(stacked [L, ...] layer params)"
            )
        pipe = dataclasses.replace(
            pipe,
            features_fn=lambda enc_params, norm_wav: pipelined_encoder_apply(
                pipe.cfg.embedder, enc_params, norm_wav, mesh,
                data_axis=mesh_cfg.data_axis,
            ),
        )

    fn = jax.jit(
        lambda p, wav: pipe.explain(p, wav, decoder, masking),
        in_shardings=(None, data),
    )
    return fn, sharded
