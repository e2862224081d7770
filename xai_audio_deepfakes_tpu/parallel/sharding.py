"""Parameter sharding rules (GSPMD partition specs by param path).

Tensor-parallel layout for the wav2vec2 embedder — the standard Megatron
split expressed as jax.sharding specs (XLA inserts the all-reduces):

  * attention q/k/v kernels [H, H]:   split output (head) dim over 'model'
  * attention out_proj kernel [H, H]: split input dim  over 'model'
  * ffn_in kernel [H, 4H]:            split output dim over 'model'
  * ffn_out kernel [4H, H]:           split input dim  over 'model'
  * biases of row-split layers:       split over 'model'; out-proj/ffn_out
                                      biases replicated
  * everything else (LN, convs, projections): replicated

With model_parallel=1 every spec degenerates to replicated and the mesh is
pure data-parallel — exactly the reference's DDP semantics.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from xai_audio_deepfakes_tpu.config import MeshConfig


def _spec_for_path(path: tuple, axis: str, ndim: int) -> P:
    """Kernel rank disambiguates the unrolled (2-D) vs scanned (3-D, leading
    [L] layer axis from `EmbedderConfig.scan_layers`) layouts."""
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    joined = "/".join(str(n) for n in names)
    if "q_proj" in joined or "k_proj" in joined or "v_proj" in joined or "ffn_in" in joined:
        if joined.endswith("kernel"):
            return P(None, axis) if ndim == 2 else P(None, None, axis)
        if joined.endswith("bias"):
            return P(axis) if ndim == 1 else P(None, axis)
    if "out_proj" in joined or "ffn_out" in joined:
        if joined.endswith("kernel"):
            return P(axis, None) if ndim == 2 else P(None, axis, None)
        return P()
    return P()


def embedder_param_specs(params: dict, cfg: MeshConfig = MeshConfig()):
    """Pytree of PartitionSpec matching an encoder param tree."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _spec_for_path(path, cfg.model_axis, leaf.ndim),
        params,
    )


def embedder_pp_param_specs(
    params: dict,
    n_stages: int = 0,
    stage_axis: str = "stage",
    mesh_cfg: MeshConfig | None = None,
):
    """Pipeline-parallel placement for a scan-layers encoder tree: the
    stacked transformer-layer params ('layers/layer', leading [L] axis)
    shard over `stage_axis`; the conv frontend / projection / pos-conv stay
    replicated (they run before the pipeline rotation). When the full stack
    length L is not divisible by the stage count (a truncated readout like
    `output_layer < num_layers` slices the stack before the rotation), the
    stack stays replicated and `pipeline_apply`'s shard_map reshards the
    sliced [:output_layer] block instead.

    With `mesh_cfg.model_parallel > 1` the stacked layers' Megatron kernel
    dims additionally shard over the model axis (dp x pp x tp — the model
    axis stays GSPMD-auto inside the pipeline shard_map)."""
    tp = mesh_cfg is not None and mesh_cfg.model_parallel > 1

    def spec(path, leaf):
        names = "/".join(
            str(getattr(p, "key", getattr(p, "name", p))) for p in path
        )
        if "layers/layer" in names and (
            n_stages and leaf.shape[0] % n_stages == 0
        ):
            tail = (
                tuple(_spec_for_path(path, mesh_cfg.model_axis, leaf.ndim))[1:]
                if tp
                else ()
            )
            if not tail:
                tail = (None,) * (leaf.ndim - 1)
            return P(stage_axis, *tail)
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def embedder_pp_tp_param_specs(
    layer_params: dict,
    mesh_cfg: MeshConfig = MeshConfig(),
    stage_axis: str = "stage",
):
    """dp x pp x tp placement for a STACKED transformer-layer tree (the
    `params['params']['layers']['layer']` subtree, leading [L] axis):
    the layer axis shards over `stage_axis` (pipeline stages) and the
    Megatron dims of each kernel shard over the model axis — consumed by
    `pipeline_apply` on a ('data', 'stage', 'model') mesh, where the
    'model' axis is left auto for GSPMD (see `parallel/pipeline.py`)."""
    tp = embedder_param_specs(layer_params, mesh_cfg)

    def merge(s):
        t = tuple(s)
        return P(stage_axis, *t[1:]) if t else P(stage_axis)

    return jax.tree.map(merge, tp, is_leaf=lambda s: isinstance(s, P))


def shard_params(params: dict, mesh: Mesh, specs=None) -> dict:
    """Place a param tree on the mesh (replicated unless a spec says otherwise)."""
    if specs is None:
        specs = jax.tree.map(lambda _: P(), params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
