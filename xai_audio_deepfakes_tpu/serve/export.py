"""AOT serving artifacts: serialize the compiled explain graph to disk.

The reference has no deployment story at all — its only serving surface is a
Streamlit process that re-imports the whole model stack and re-traces torch
modules in-process (`streamlit_controlled_study.py:156-228`). The TPU-native
production path is ahead-of-time: trace + lower the full explain graph ONCE
(`pipeline/core.py::explain` — STFT -> mask -> masked iSTFTs -> fused 3xB
re-embed -> probs), serialize the StableHLO artifact with `jax.export`, and
let any later process load and run it with NO model code, NO flax, and NO
re-trace — just the artifact, the weights, and a jax runtime. Artifacts are
exported for both "tpu" and "cpu" lowering platforms by default, so the same
bytes serve on a v5e chip or on a CPU fallback box.

Layout of an artifact directory:

    explain.jaxexport   serialized StableHLO graph (versioned jax.export blob)
    params.npz          weights, flattened with '/'-joined tree paths
    meta.json           batch size, clip samples, decoder, masking, platforms

Weights stay OUTSIDE the graph (passed as call arguments): baking 1-2 GB of
embedder weights into the HLO as constants would bloat the artifact and
defeat weight hot-swapping (a retrained mask decoder drops in by replacing
params.npz alone — checkpoint naming contract of `LMAC_metrics.py:21`).
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable

import jax
import numpy as np

from xai_audio_deepfakes_tpu.config import MaskingConvention

_GRAPH_FILE = "explain.jaxexport"
_PARAMS_FILE = "params.npz"
_META_FILE = "meta.json"

_REGISTERED = False


def _ensure_registered() -> None:
    """jax.export serializes the output pytree structure; the ExplainOutput
    NamedTuple must be registered under a stable name on BOTH the export and
    the deserialize side (idempotent, so safe to call from either path)."""
    global _REGISTERED
    if _REGISTERED:
        return
    from jax import export as jax_export

    from xai_audio_deepfakes_tpu.pipeline.core import ExplainOutput

    jax_export.register_namedtuple_serialization(
        ExplainOutput,
        serialized_name="xai_audio_deepfakes_tpu.pipeline.core.ExplainOutput",
    )
    _REGISTERED = True


# ----------------------------------------------------------------------
# param tree <-> flat npz
# ----------------------------------------------------------------------


def flatten_params(params: dict, prefix: str = "") -> dict:
    """Nested dict-of-arrays -> {'a/b/c': array}. Keys must not contain '/'."""
    out: dict = {}
    for k, v in params.items():
        assert "/" not in str(k), f"param key {k!r} contains '/'"
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(flatten_params(v, key + "/"))
        else:
            out[key] = np.asarray(v)
    return out


def unflatten_params(flat: dict) -> dict:
    out: dict = {}
    for key, v in flat.items():
        node = out
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


# ----------------------------------------------------------------------
# export
# ----------------------------------------------------------------------


def export_explain(
    pipe,
    params: dict,
    batch_size: int,
    decoder: str = "unet",
    masking: MaskingConvention | str | None = None,
    platforms: tuple[str, ...] | None = None,
) -> bytes:
    """Lower + serialize `pipe.explain` at a fixed batch size.

    `platforms=None` exports for the current backend. Returns the versioned
    `jax.export` blob. The exported callable has signature
    (params, wav[batch, num_samples]) -> ExplainOutput tuple.
    """
    from jax import export as jax_export

    _ensure_registered()
    if platforms is None:
        platforms = (jax.default_backend(),)
    # The encoder picks its attention implementation at TRACE time
    # (`models/wav2vec2.EncoderLayer`: Pallas fused kernel iff the backend is
    # TPU), so a trace taken on TPU contains a TPU-only kernel and cannot
    # lower for other platforms. Fail with the workaround instead of a
    # cryptic Mosaic lowering error.
    pallas_opts = [
        name
        for name, on in (
            ("fused-attention", pipe.cfg.embedder.fused_attention),
            ("fused-conv", pipe.cfg.embedder.fused_conv),
        )
        if on
    ]
    if (
        pallas_opts
        and jax.default_backend() == "tpu"
        and any(p != "tpu" for p in platforms)
    ):
        raise ValueError(
            f"platforms {platforms} requested, but tracing on the TPU "
            f"backend bakes the Pallas {'/'.join(pallas_opts)} kernel(s) "
            "(TPU-only) into the graph. Export per-platform artifacts "
            "instead: --platforms tpu here, and a CPU artifact from a "
            "CPU-pinned process (cli --platform cpu export --platforms cpu)."
        )
    masking = MaskingConvention(masking) if masking is not None else None
    fn = jax.jit(lambda p, w: pipe.explain(p, w, decoder=decoder, masking=masking))
    n = pipe.cfg.audio.num_samples
    p_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype), params
    )
    w_spec = jax.ShapeDtypeStruct((batch_size, n), np.float32)
    exp = jax_export.export(fn, platforms=list(platforms))(p_spec, w_spec)
    return exp.serialize()


def save_exported(
    out_dir: str,
    pipe,
    params: dict,
    batch_size: int,
    decoder: str = "unet",
    masking: MaskingConvention | str | None = None,
    platforms: tuple[str, ...] | None = None,
) -> str:
    """Write a self-contained serving artifact directory; returns its path."""
    os.makedirs(out_dir, exist_ok=True)
    if platforms is None:
        platforms = (jax.default_backend(),)
    blob = export_explain(pipe, params, batch_size, decoder, masking, platforms)
    with open(os.path.join(out_dir, _GRAPH_FILE), "wb") as f:
        f.write(blob)
    np.savez(os.path.join(out_dir, _PARAMS_FILE), **flatten_params(params))
    eff_masking = MaskingConvention(masking) if masking is not None else pipe.cfg.masking
    meta = {
        "batch_size": batch_size,
        "num_samples": pipe.cfg.audio.num_samples,
        "sample_rate": pipe.cfg.audio.sample_rate,
        "decoder": decoder,
        "masking": str(getattr(eff_masking, "value", eff_masking)),
        "platforms": list(platforms),
        "jax_version": jax.__version__,
    }
    with open(os.path.join(out_dir, _META_FILE), "w") as f:
        json.dump(meta, f, indent=2)
    return out_dir


# ----------------------------------------------------------------------
# load + run
# ----------------------------------------------------------------------


class ExportedExplain:
    """A loaded serving artifact: `__call__(wav[B, N]) -> ExplainOutput`-shaped
    tuple, no model code involved. Weights ride along from params.npz but can
    be hot-swapped via `with_params`."""

    def __init__(self, exported, params: dict, meta: dict):
        self._exported = exported
        # Pin weights to the device ONCE. Leaving them as host numpy would
        # re-transfer the full tree (1.8 GB at serving geometry) on every
        # call — measured to blow the serving mailbox timeout through a
        # tunneled chip.
        self.params = jax.device_put(params)
        self.meta = meta
        self.batch_size = int(meta["batch_size"])
        self.num_samples = int(meta["num_samples"])

    def __call__(self, wav: np.ndarray):
        wav = np.asarray(wav, np.float32)
        if wav.shape != (self.batch_size, self.num_samples):
            raise ValueError(
                f"exported graph is fixed-shape: expected "
                f"{(self.batch_size, self.num_samples)}, got {wav.shape}"
            )
        return self._exported.call(self.params, wav)

    def with_params(self, params: dict) -> "ExportedExplain":
        return ExportedExplain(self._exported, params, self.meta)


def load_exported(artifact_dir: str) -> ExportedExplain:
    from jax import export as jax_export

    _ensure_registered()
    with open(os.path.join(artifact_dir, _GRAPH_FILE), "rb") as f:
        exported = jax_export.deserialize(f.read())
    with np.load(os.path.join(artifact_dir, _PARAMS_FILE)) as z:
        params = unflatten_params({k: z[k] for k in z.files})
    with open(os.path.join(artifact_dir, _META_FILE)) as f:
        meta = json.load(f)
    return ExportedExplain(exported, params, meta)
