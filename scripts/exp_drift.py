"""Long-horizon bf16 serving stability: does half-precision streaming
state DRIFT from the f32 trajectory over thousands of chunks?

Round-2 measured 42-48 dB bf16-vs-f32 agreement over 40 chunks; a
production serving claim needs the long-horizon trend: recurrent state
(LSTM carries, conv rings, OLA tails) could accumulate rounding walk.
This streams ~30 s of real speech (test_case wav, tiled) through the
flagship TSE engine and the DPCRN NS engine in f32 and bf16 and reports
the bf16-vs-f32 SNR per 5 s window — flat windows = no drift.

Run: python scripts/exp_drift.py [seconds]
"""
import sys

sys.path.insert(0, ".")

import bench  # noqa: E402

bench._enable_compile_cache()

import numpy as np  # noqa: E402


def windows_snr(a, b, sr, win_s=5.0):
    out = []
    n = int(sr * win_s)
    for i in range(0, min(len(a), len(b)) - n + 1, n):
        x, y = a[i:i + n], b[i:i + n]
        den = float(np.sum((x - y) ** 2))
        out.append(round(10 * np.log10(float(np.sum(x ** 2)) /
                                       max(den, 1e-20)), 1))
    return out


def main():
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 30.0
    import jax
    import jax.numpy as jnp
    from scipy.io import wavfile

    from puresound_tpu.nnet.base_nn import SoTaskWrapModule
    from puresound_tpu.streaming.file_eval import build_engine, stream_signal
    from puresound_tpu.zoo import init_tse_model
    from puresound_tpu.zoo.ns import init_model as init_ns_model

    sr, wav = wavfile.read(
        "/root/reference/test/test_case/"
        "1272-128104-0000_2035-147961-0014.wav")
    wav = wav.astype(np.float32) / 32768.0
    reps = int(np.ceil(seconds * sr / len(wav)))
    sig = np.tile(wav, reps)[: int(seconds * sr)]

    # --- TSE flagship ---
    model = init_tse_model("tse_skim_v0_causal")
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(sig[None, : sr])
    variables = model.init(jax.random.PRNGKey(0), x0, x0,
                           method=SoTaskWrapModule.inference)
    engine, evars = build_engine(model), variables
    dvec = np.asarray(model.apply(
        variables, x0, method=SoTaskWrapModule.inference_tse_embedding))
    dvec = dvec.reshape(dvec.shape[0], -1)  # [N, E] (method may emit [N,E,1])
    y32, rtf32 = stream_signal(engine, evars, sig, sr, chunk_ms=15.0,
                               dvec=jnp.asarray(dvec))
    y16, rtf16 = stream_signal(engine, evars, sig, sr, chunk_ms=15.0,
                               dvec=jnp.asarray(dvec), half=True)
    print({"tse_windows_snr_db": windows_snr(y16, y32, sr),
           "rtf_f32": round(rtf32, 1), "rtf_bf16": round(rtf16, 1)},
          flush=True)

    # --- NS DPCRN (dp_kernel) ---
    ns = init_ns_model("ns_dpcrn_v0_causal")
    nvars = ns.init(jax.random.PRNGKey(0), x0, None,
                    method=SoTaskWrapModule.inference)
    nengine = build_engine(ns)
    z32, _ = stream_signal(nengine, nvars, sig, sr, chunk_ms=16.0,
                           dp_kernel=True)
    z16, _ = stream_signal(nengine, nvars, sig, sr, chunk_ms=16.0,
                           dp_kernel=True, half=True)
    print({"ns_dpcrn_windows_snr_db": windows_snr(z16, z32, sr)}, flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
