"""StableHLO model export (jax.export) shared by all recipe CLIs.

The reference only exports TSE models, as four torch.jit traces
(/root/reference/egs/tse/main.py:406-443: SpeakerNet / EncoderNet /
decoderNet / MaskNet). Here every task family exports:

- the same per-subnet artifacts (where the subnet exists for the model),
- ``FullModel`` — the whole offline inference graph in one artifact,
- ``StreamStep`` — the chunked streaming serving step (state pytree
  in/out), which the reference's offline-only traces never had.

Artifacts are `jax.export` serialized StableHLO: loadable from any
version-compatible JAX process with `jax.export.deserialize` and callable
on TPU/CPU without the model-building Python.
"""
from __future__ import annotations

from typing import Dict, List, Tuple


def _subnet_fns(model, variables, dummy_wav) -> Dict[str, Tuple]:
    """Name -> (fn, example_args) for every exportable subnet."""
    import flax.linen as nn
    import jax.numpy as jnp

    from ..nnet.base_nn import SiMoTaskWrapModule, SoTaskWrapModule

    if isinstance(model, SiMoTaskWrapModule):
        def enc_fn(wav):
            return model.apply(variables, wav,
                               method=SiMoTaskWrapModule._encode)

        def mask_fn(feats):
            return nn.apply(lambda m, f: m.masker(f, train=False),
                            model)(variables, feats)

        def dec_fn(enh_feats):
            return model.apply(variables, enh_feats,
                               method=SiMoTaskWrapModule._decode_multi)

        def full_fn(wav):
            return model.apply(variables, wav,
                               method=SiMoTaskWrapModule.inference)

        dummy_feats = enc_fn(dummy_wav)
        dummy_masks = mask_fn(dummy_feats)          # [N, M, C, T]
        return {
            "EncoderNet": (enc_fn, (dummy_wav,)),
            "MaskNet": (mask_fn, (dummy_feats,)),
            "decoderNet": (dec_fn, (jnp.zeros_like(dummy_masks),)),
            "FullModel": (full_fn, (dummy_wav,)),
        }

    def enc_fn(wav):
        return model.apply(variables, wav,
                           method=SoTaskWrapModule._encode_mix)

    def dec_fn(feats):
        return model.apply(variables, feats, method=SoTaskWrapModule._decode)

    dummy_feats = enc_fn(dummy_wav)
    exports: Dict[str, Tuple] = {
        "EncoderNet": (enc_fn, (dummy_wav,)),
        "decoderNet": (dec_fn, (dummy_feats,)),
    }

    if model.embedding_free_tse:
        # conditioning lives in the masker's initial hidden states — there
        # is no standalone SpeakerNet/MaskNet split to export
        def full_fn(wav, enroll):
            return model.apply(variables, wav, enroll,
                               method=SoTaskWrapModule.inference)

        exports["FullModel"] = (full_fn, (dummy_wav, dummy_wav))
    elif model.speaker_net is not None:
        def spk_fn(wav):
            return model.apply(
                variables, wav,
                method=SoTaskWrapModule.inference_tse_embedding)

        dvec = spk_fn(dummy_wav)
        dv = dvec.squeeze(-1) if dvec.ndim == 3 else dvec

        def mask_fn(feats, d):
            return nn.apply(lambda m, f, dd: m.masker(f, dd, train=False),
                            model)(variables, feats, d)

        def full_fn(wav, enroll):
            return model.apply(variables, wav, enroll,
                               method=SoTaskWrapModule.inference)

        exports["SpeakerNet"] = (spk_fn, (dummy_wav,))
        exports["MaskNet"] = (mask_fn, (dummy_feats, dv))
        exports["FullModel"] = (full_fn, (dummy_wav, dummy_wav))
    else:
        # plain SE/NS: no conditioning anywhere
        def mask_fn(feats):
            return nn.apply(lambda m, f: m.masker(f, train=False),
                            model)(variables, feats)

        def full_fn(wav):
            return model.apply(variables, wav,
                               method=SoTaskWrapModule.inference)

        exports["MaskNet"] = (mask_fn, (dummy_feats,))
        exports["FullModel"] = (full_fn, (dummy_wav,))
    return exports


def _stream_step_fn(model, variables, sample_rate: int):
    """(fn, example_args) for the streaming serving step, or raises
    TypeError when the model has no streaming engine."""
    import jax.numpy as jnp

    from ..streaming.engine import StreamingTSE
    from ..streaming.file_eval import build_engine
    from ..streaming.ns_engine import StreamingNS
    from ..streaming.simo_engine import StreamingDSS

    engine = build_engine(model)
    hop = model.encoder.hop_length
    chunk = jnp.zeros((1, 4 * hop))
    state0 = engine.apply(variables, 1, method=type(engine).init_state)

    if isinstance(engine, StreamingDSS):
        def stream_fn(chunk, state):
            return engine.apply(variables, chunk, state,
                                method=StreamingDSS.step)

        return stream_fn, (chunk, state0)

    dvec = None
    if model.speaker_net is not None or model.embedding_free_tse:
        dvec = engine.apply(variables, jnp.zeros((1, sample_rate)),
                            method=type(engine).embed)

    if isinstance(engine, StreamingNS):
        if dvec is None:
            def stream_fn(chunk, state):
                return engine.apply(variables, chunk, state,
                                    method=StreamingNS.step)

            return stream_fn, (chunk, state0)

        def stream_fn(chunk, state, dvec):
            return engine.apply(variables, chunk, state, dvec,
                                method=StreamingNS.step)

        return stream_fn, (chunk, state0, dvec)

    if isinstance(engine, StreamingTSE):
        if dvec is not None and dvec.ndim == 3:
            # embedding-free: conditioning is carried in the state
            def stream_fn(chunk, state):
                return engine.apply(variables, chunk, None, state,
                                    method=StreamingTSE.step)

            return stream_fn, (chunk, state0)

        def stream_fn(chunk, dvec, state):
            return engine.apply(variables, chunk, dvec, state,
                                method=StreamingTSE.step)

        return stream_fn, (chunk, dvec, state0)

    raise TypeError(f"no streaming export for engine {type(engine).__name__}")


def export_stablehlo(model, variables, sample_rate: int, save_dir: str,
                     tag: str) -> List[str]:
    """Serialize every exportable artifact of `model` to
    ``{save_dir}/{tag}.{Name}.stablehlo``; returns the written paths."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    dummy_wav = jnp.zeros((1, sample_rate * 5))
    exports = _subnet_fns(model, variables, dummy_wav)
    try:
        exports["StreamStep"] = _stream_step_fn(model, variables, sample_rate)
    except TypeError as e:
        print(f"streaming step not exportable for this model: {e}")

    paths = []
    for name, (fn, args) in exports.items():
        exp = jexport.export(jax.jit(fn))(*args)
        data = exp.serialize()
        path = f"{save_dir}/{tag}.{name}.stablehlo"
        with open(path, "wb") as f:
            f.write(data)
        print(f"exported {name}: {path} ({len(data)} bytes)")
        paths.append(path)
    return paths
