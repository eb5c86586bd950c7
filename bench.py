"""Benchmark: concurrent real-time 16 kHz streaming-TSE streams per chip.

Runs the flagship streaming model (tse_skim_v0_causal structure: FreeEncDec
32/16/128 + causal SkiM 128/256 x4 + FiLM) as the batched jitted streaming
step on the available accelerator, finds the largest stream batch whose
20 ms-chunk step latency stays under 20 ms (real time), and prints ONE JSON
line. Baseline: 500 streams/chip (BASELINE.json north star; the reference
itself publishes no throughput numbers).
"""
import json
import os
import sys
import time

import numpy as np


def build_engine():
    import jax
    import jax.numpy as jnp

    from puresound_tpu.nnet.conv_tasnet import TCN
    from puresound_tpu.nnet.encoder import FreeEncDec
    from puresound_tpu.nnet.lobe.cnn import Conv1d
    from puresound_tpu.nnet.lobe.pooling import AttentiveStatisticsPooling
    from puresound_tpu.nnet.skim import SkiM
    from puresound_tpu.streaming.engine import StreamingTSE

    encoder = FreeEncDec(win_length=32, hop_length=16, laten_length=128,
                         output_active=True)
    masker = SkiM(input_size=128, hidden_size=256, output_size=128,
                  n_blocks=4, seg_size=150, seg_overlap=False, causal=True,
                  embed_dim=192, embed_norm=True, embed_fusion="FiLM",
                  block_with_embed=(1, 1, 1, 1))
    speaker_net = tuple(
        [TCN(128, 256, 3, dilation=2**i, causal=False, tcn_norm="gLN",
             dconv_norm="gGN") for i in range(5)]
        + [AttentiveStatisticsPooling(128, 128),
           Conv1d(256, 192, 1, use_bias=False)])
    return StreamingTSE(encoder=encoder, masker=masker,
                        speaker_net=speaker_net, mask_constraint="ReLU")


def measure_step_ms(engine, params, B, chunk_samples, iters=30, fused=True,
                    dtype=None):
    import jax
    import jax.numpy as jnp

    from puresound_tpu.streaming.engine import StreamingTSE

    dtype = dtype or jnp.float32
    dot_dtype = dtype if dtype == jnp.bfloat16 else jnp.float32
    # bf16 halves the kernel's VMEM pressure, unlocking the larger stream
    # tile (measured 10.4 ms vs 12.4 ms at B=16384; 512 OOMs)
    b_tile = 256 if dtype == jnp.bfloat16 else 128
    if dtype == jnp.bfloat16:
        from puresound_tpu.streaming.halfprec import to_half

        params = to_half(params)
    state = engine.apply(params, B, dtype, method=StreamingTSE.init_state)
    dvec = jnp.zeros((B, 192), dtype)
    chunk = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, chunk_samples))
        .astype(np.float32) * 0.1).astype(dtype)

    @jax.jit
    def step(chunk, dvec, state):
        return engine.apply(params, chunk, dvec, state, fused=fused,
                            b_tile=b_tile, dot_dtype=dot_dtype,
                            method=StreamingTSE.step)

    out, state = step(chunk, dvec, state)  # compile
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out, state = step(chunk, dvec, state)
    out.block_until_ready()
    return (time.perf_counter() - t0) / iters * 1000.0


def measure_denoise_rtf(seconds: float = 10.0, iters: int = 10) -> float:
    """Single-stream NS (ns_dpcrn_v0_causal) offline real-time factor."""
    import jax
    import jax.numpy as jnp

    from puresound_tpu.nnet.base_nn import SoTaskWrapModule
    from puresound_tpu.zoo import init_ns_model

    model = init_ns_model("ns_dpcrn_v0_causal")
    L = int(16000 * seconds)
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((1, L)).astype(np.float32) * 0.1)
    variables = model.init(jax.random.PRNGKey(0), x,
                           method=SoTaskWrapModule.inference)

    @jax.jit
    def infer(x):
        return model.apply(variables, x, method=SoTaskWrapModule.inference)

    infer(x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = infer(x)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return seconds / dt


def main():
    import jax

    if os.environ.get("BENCH_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")

    engine = build_engine()
    rng = np.random.default_rng(0)
    import jax.numpy as jnp

    from puresound_tpu.streaming.engine import StreamingTSE

    x0 = jnp.asarray(rng.standard_normal((1, 640)).astype(np.float32))
    enroll0 = jnp.asarray(rng.standard_normal((1, 3200)).astype(np.float32))
    variables = engine.init(jax.random.PRNGKey(0), x0, enroll0,
                            method=StreamingTSE.init_all)

    # 15 ms chunks: 240 samples = 15 frames, which divides the SkiM
    # seg_size (150) so the Pallas fused kernel handles segment boundaries
    # with a single cond per chunk. Still < 20 ms latency budget.
    chunk_ms = 15.0
    chunk_samples = int(16000 * chunk_ms / 1000)
    fused = (not os.environ.get("BENCH_NO_FUSED")
             and jax.devices()[0].platform == "tpu")
    # serving dtype: bf16 on TPU (measured 39.7 dB SNR vs f32, no carry
    # drift — tests/test_streaming_ns.py::test_bf16_serving_mode_snr);
    # BENCH_F32=1 opts out, and any bf16 failure falls back to f32.
    dtype = (jnp.bfloat16 if fused and not os.environ.get("BENCH_F32")
             else jnp.float32)
    best_streams = 0
    best = None
    results = []
    for B in (2048, 8192, 16384, 32768):
        try:
            ms = measure_step_ms(engine, variables, B, chunk_samples,
                                 fused=fused, dtype=dtype)
        except Exception as e:  # OOM etc.
            if dtype == jnp.bfloat16 and not results:
                print(f"# bf16 failed ({type(e).__name__}); f32 fallback",
                      file=sys.stderr)
                dtype = jnp.float32
                try:
                    ms = measure_step_ms(engine, variables, B, chunk_samples,
                                         fused=fused, dtype=dtype)
                except Exception as e2:
                    print(f"# B={B} failed: {type(e2).__name__}",
                          file=sys.stderr)
                    break
            else:
                print(f"# B={B} failed: {type(e).__name__}", file=sys.stderr)
                break
        rt_mult = chunk_ms / ms
        results.append((B, ms, rt_mult))
        if ms <= chunk_ms and B > best_streams:
            best_streams = B
            best = (B, ms, rt_mult)
        if ms > 2 * chunk_ms:
            break

    if best is None:
        # even the smallest batch missed real time; report fractional capacity
        B, ms, rt = results[0]
        value = B * chunk_ms / ms
        step_ms = ms
    else:
        B, ms, rt = best
        value = B * rt  # streams at full real-time occupancy
        step_ms = ms

    try:
        denoise_rtf = round(measure_denoise_rtf(), 1)
    except Exception:
        denoise_rtf = None

    print(json.dumps({
        "metric": "concurrent_16khz_streaming_tse_streams_per_chip",
        "value": round(float(value), 1),
        "unit": "streams",
        "vs_baseline": round(float(value) / 500.0, 3),
        "detail": {
            "platform": jax.devices()[0].platform,
            "device": str(jax.devices()[0]),
            "chunk_ms": chunk_ms,
            "fused_pallas_kernel": fused,
            "serving_dtype": str(jnp.dtype(dtype).name),
            "step_ms_at_best_batch": round(step_ms, 3),
            "batches_tested": [[b, round(m, 2)] for b, m, _ in results],
            "denoise_rtf_single_stream": denoise_rtf,
            "denoise_rtf_target": 20.0,
        },
    }))


if __name__ == "__main__":
    main()
