"""DSS (distance-based near/far separation) recipe CLI: train / dev / eval.

The reference implements the DSS task runtime (puresound/task/dss.py) but
ships no recipe for it; this CLI completes the surface using the SIMO
wrapper with a multi-output DPARN masker.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import numpy as np


def build_model(hparam, sig_loss=None):
    from puresound_tpu.nnet.base_nn import SiMoTaskWrapModule
    from puresound_tpu.nnet.dparn import DPARN_Mout
    from puresound_tpu.nnet.encoder import ConvEncDec

    if hparam["MODEL"]["type"] != "dss_dparn_mout_v0":
        raise NameError(hparam["MODEL"]["type"])
    return SiMoTaskWrapModule(
        encoder=ConvEncDec(fft_length=512, win_length=512, hop_length=128,
                           trainable=True, output_format="Complex"),
        masker=DPARN_Mout(input_type="RI", input_dim=512, norm_type="bN2d",
                          dropout=0.1, channels=(1, 32, 32, 32, 64, 128),
                          transpose_t_size=2, kernel_t=(2, 2, 2, 2, 2),
                          stride_t=(1, 1, 1, 1, 1), dilation_t=(1, 1, 1, 1, 1),
                          kernel_f=(5, 3, 3, 3, 3), stride_f=(2, 2, 1, 1, 1),
                          dilation_f=(1, 1, 1, 1, 1), delay=(0, 0, 0, 0, 0),
                          multi_output=2, rnn_hidden=128, nhead=8),
        loss_func_wav=sig_loss, f_type="Complex", mask_type="Complex",
        drop_first_bin=True)


def load_eval_model(hparam, ckpt_name):
    """build_model + init + checkpoint params, shared by every non-train
    action (mirrors egs/ns/main.py:load_eval_model; TRAIN.model_average: N
    averages the last N epoch ckpts)."""
    import jax
    import jax.numpy as jnp

    from puresound_tpu.nnet.base_nn import SiMoTaskWrapModule
    from puresound_tpu.tasks.base import BaseTrainer

    model = build_model(hparam)
    sr = hparam["DATASET"]["sample_rate"]
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, sr)),
                           method=SiMoTaskWrapModule.inference)
    variables = BaseTrainer.resolve_eval_params(hparam, ckpt_name, variables)
    return model, variables


def action_train(hparam, backend):
    import jax
    import jax.numpy as jnp

    from puresound_tpu.nnet.loss.sdr import SDRLoss
    from puresound_tpu.tasks.base import DataLoader
    from puresound_tpu.tasks.dss import DssCollateFunc, DssDataset, DssTask

    sig_loss = SDRLoss.init_mode(hparam["LOSS"]["sig_loss"],
                                 threshold=hparam["LOSS"].get("sig_threshold"))
    model = build_model(hparam, sig_loss)

    def make_loader(folder):
        ds = DssDataset(folder=folder,
                        resample_to=hparam["DATASET"]["sample_rate"],
                        max_length=hparam["DATASET"]["max_length"],
                        noise_folder=hparam["DATASET"]["noise_folder"],
                        vol_perturbed=hparam["DATASET"]["vol_perturbed"],
                        speed_perturbed=hparam["DATASET"]["speed_perturbed"])
        import jax

        kw = dict(seed=hparam["TRAIN"].get("seed"))
        if jax.process_count() > 1:
            kw = dict(shard=(jax.process_index(), jax.process_count()),
                      seed=int(hparam["TRAIN"].get("seed") or 0))
        return DataLoader(ds, batch_size=hparam["TRAIN"]["batch_size"],
                          shuffle=True, collate_fn=DssCollateFunc(),
                          num_workers=int(hparam["TRAIN"].get("num_workers", 0)),
                          **kw)

    def init_fn():
        sr = hparam["DATASET"]["sample_rate"]
        L = sr * (hparam["DATASET"]["max_length"] or 1)
        return model.init(
            {"params": jax.random.PRNGKey(0)}, noisy=jnp.zeros((2, L)),
            ref_clean=jnp.zeros((2, 2, L)),
            inactive_labels=jnp.zeros((2, 2), bool), train=False)

    trainer = DssTask(hparam, model, init_fn, backend,
                      make_loader(hparam["DATASET"]["train"]),
                      make_loader(hparam["DATASET"]["dev"]))
    trainer.train()


def action_dev(hparam, backend, ckpt, batch_eval=0, eval_quantum=1.0):
    import jax
    import jax.numpy as jnp

    from puresound_tpu.nnet.base_nn import SiMoTaskWrapModule
    from puresound_tpu.src.metrics import Metrics
    from puresound_tpu.tasks.base import DataLoader
    from puresound_tpu.tasks.dss import DssCollateFunc, DssDataset

    model, variables = load_eval_model(hparam, ckpt)
    sr = hparam["DATASET"]["sample_rate"]
    ds = DssDataset(folder=hparam["DATASET"]["dev"], resample_to=sr,
                    max_length=None)
    loader = DataLoader(ds, batch_size=1, shuffle=False,
                        collate_fn=DssCollateFunc())

    def scored_pairs():
        """Yield (batch, out[1, M, L]) in manifest order; --batch_eval N
        runs bucketed+padded+jitted separation at batch N (one compile
        per length bucket instead of per utterance)."""
        if batch_eval > 0:
            from puresound_tpu.tasks.batch_eval import BucketedBatchRunner

            batches = list(loader)
            runner = BucketedBatchRunner(
                lambda n: model.apply(variables, n,
                                      method=SiMoTaskWrapModule.inference),
                batch_size=batch_eval, quantum=int(sr * eval_quantum),
                pad_modes=("zero",))
            outs = runner.run([(b["process_wav"],) for b in batches])
            print(f"batch_eval: {len(runner.bucket_keys)} bucket shapes "
                  f"for {len(batches)} utterances")
            for b, o in zip(batches, outs):
                yield b, np.asarray(o)[None]
        else:
            for b in loader:
                yield b, np.asarray(model.apply(
                    variables, jnp.asarray(b["process_wav"]),
                    method=SiMoTaskWrapModule.inference))

    near_scores, far_scores = [], []
    print("uttid, SISNR(near), SISNR(far)")
    for batch, out in scored_pairs():
        s_near = Metrics.sisnr(batch["near_wav"], out[:, 0])
        s_far = Metrics.sisnr(batch["far_wav"], out[:, 1])
        near_scores.append(s_near)
        far_scores.append(s_far)
        print(f"{batch['uttid'][0]}, {s_near}, {s_far}")
    print(f"SiSNR near: {np.mean(near_scores)}")
    print(f"SiSNR far: {np.mean(far_scores)}")


def action_eval(hparam, backend, ckpt, batch_eval=0, eval_quantum=1.0):
    """Offline separation over DATASET.eval: one mixture in, the M
    separated sources out as {key}_near.wav / {key}_far.wav (mirrors the
    NS/TSE eval actions; the reference ships no DSS recipe at all)."""
    import jax
    import jax.numpy as jnp

    from puresound_tpu.nnet.base_nn import SiMoTaskWrapModule
    from puresound_tpu.src.audio import AudioIO
    from puresound_tpu.src.utils import create_folder, load_text_as_dict

    out_dir = f"{hparam['TRAIN']['model_save_dir']}/eval_audio"
    create_folder(out_dir)
    model, variables = load_eval_model(hparam, ckpt)
    sr = hparam["DATASET"]["sample_rate"]
    test_audio = load_text_as_dict(f"{hparam['DATASET']['eval']}/wav2scp.txt")

    def load_mix(key):
        mix, wav_sr = AudioIO.open(f_path=test_audio[key][0])
        if wav_sr != sr:
            mix = AudioIO.resample(mix, wav_sr, sr)
        mix = np.asarray(mix)
        if mix.ndim == 2 and mix.shape[0] > 1:
            # downmix multi-channel to mono: the batched runner assumes one
            # row per item (a stereo file would silently shift every later
            # item's output in the batch)
            mix = mix.mean(axis=0, keepdims=True)
        return mix

    def save_sources(key, out):
        # out [M, L]
        for m, tag in enumerate(["near", "far"][:out.shape[0]]):
            AudioIO.save(out[m].reshape(1, -1),
                         f"{out_dir}/{key}_{tag}.wav", sr)

    keys = list(test_audio.keys())
    if batch_eval > 0:
        from puresound_tpu.tasks.batch_eval import BucketedBatchRunner

        runner = BucketedBatchRunner(
            lambda n: model.apply(variables, n,
                                  method=SiMoTaskWrapModule.inference),
            batch_size=batch_eval, quantum=int(sr * eval_quantum),
            pad_modes=("zero",))
        group = max(batch_eval * 8, 64)
        for start in range(0, len(keys), group):
            chunk = keys[start:start + group]
            outs = runner.run([(load_mix(k),) for k in chunk])
            for k, o in zip(chunk, outs):
                print(f"Running inference: {k}")
                save_sources(k, np.asarray(o))
        return
    for key in keys:
        print(f"Running inference: {key}")
        out = np.asarray(model.apply(variables, jnp.asarray(load_mix(key)),
                                     method=SiMoTaskWrapModule.inference))
        save_sources(key, out[0])


def action_serve(hparam, backend, ckpt, chunk_ms, n_slots, port,
                 half=False, fused=False, mk_kernel=False, pcm16=False):
    """Production SIMO serving: each connection streams a mixture and gets
    the M separated sources back sample-interleaved (ACK carries
    n_sources; StreamingClient de-interleaves to [M, T])."""
    from puresound_tpu.streaming.deploy import run_serve

    model, variables = load_eval_model(hparam, ckpt)
    sr = hparam["DATASET"]["sample_rate"]
    run_serve(model, variables, n_slots, port=port, chunk_ms=chunk_ms,
              sr=sr, half=half, fused=fused, mk_kernel=mk_kernel,
              pcm16=pcm16)


def action_stream_eval(hparam, backend, ckpt, chunk_ms, half=False,
                       fused=False, mk_kernel=False):
    """Chunked real-time streaming separation over the dev set: writes
    per-source (near/far) aligned wavs and reports RTF."""
    from puresound_tpu.src.audio import AudioIO
    from puresound_tpu.src.utils import create_folder, load_text_as_dict
    from puresound_tpu.streaming.file_eval import build_engine, stream_signal

    out_dir = f"{hparam['TRAIN']['model_save_dir']}/stream_eval_audio"
    create_folder(out_dir)
    model, variables = load_eval_model(hparam, ckpt)
    sr = hparam["DATASET"]["sample_rate"]
    engine = build_engine(model)
    test_audio = load_text_as_dict(f"{hparam['DATASET']['dev']}/wav2scp.txt")
    rtfs = []
    for key in test_audio.keys():
        mix, wav_sr = AudioIO.open(f_path=test_audio[key][0])
        if wav_sr != sr:
            mix = AudioIO.resample(mix, wav_sr, sr)
        out, rtf = stream_signal(engine, variables, np.asarray(mix), sr,
                                 chunk_ms=chunk_ms, half=half, fused=fused,
                                 mk_kernel=mk_kernel)
        rtfs.append(rtf)
        print(f"Streamed {key}: RTF {rtf:.1f}x real time")
        for m, tag in enumerate(["near", "far"][:out.shape[0]]):
            AudioIO.save(out[m].reshape(1, -1),
                         f"{out_dir}/{key}_{tag}.wav", sr)
    if rtfs:
        print(f"Average RTF over {len(rtfs)} utts: {np.mean(rtfs):.1f}x "
              f"({chunk_ms} ms chunks)")


def action_export(hparam, backend, ckpt):
    """Serialize jax.export StableHLO artifacts of the SIMO separator
    (EncoderNet, MaskNet, decoderNet, FullModel, StreamStep). The
    reference has no DSS export at all (TSE only,
    /root/reference/egs/tse/main.py:406-443)."""
    from puresound_tpu.utils.export import export_stablehlo

    model, variables = load_eval_model(hparam, ckpt)
    export_stablehlo(model, variables, hparam["DATASET"]["sample_rate"],
                     hparam["TRAIN"]["model_save_dir"], ckpt)


def main(config):
    from puresound_tpu.src.utils import create_folder, load_hparam

    hparam = load_hparam(config.config_path)
    create_folder(hparam["TRAIN"]["model_save_dir"])
    if config.num_processes > 1:
        # multi-host data parallelism (parallel/multihost.py); must run
        # before first device use
        from puresound_tpu.parallel.multihost import initialize

        if config.action != "train":
            raise ValueError("--num_processes > 1 applies to --action train")
        initialize(config.coordinator, config.num_processes,
                   config.process_id,
                   platform="cpu" if config.backend == "cpu" else None)
    elif config.backend == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    if config.action != "train" and not config.ckpt:
        raise ValueError(f"--ckpt is required for --action {config.action} "
                         "(a filename under TRAIN.model_save_dir)")
    if config.action == "train":
        action_train(hparam, config.backend)
    elif config.action == "dev":
        action_dev(hparam, config.backend, config.ckpt,
                   config.batch_eval, config.eval_quantum)
    elif config.action == "eval":
        action_eval(hparam, config.backend, config.ckpt,
                    config.batch_eval, config.eval_quantum)
    elif config.action == "stream_eval":
        action_stream_eval(hparam, config.backend, config.ckpt,
                           config.chunk_ms, config.half, config.fused,
                           config.mk_kernel)
    elif config.action == "serve":
        action_serve(hparam, config.backend, config.ckpt, config.chunk_ms,
                     config.serve_slots, config.port, config.half,
                     config.fused, config.mk_kernel, config.pcm16)
    elif config.action == "export_model":
        action_export(hparam, config.backend, config.ckpt)
    else:
        raise NameError("Unrecognize action.")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("config_path", type=str)
    parser.add_argument("--action", type=str, default="train",
                        choices=["train", "dev", "eval", "stream_eval",
                                 "serve", "export_model"])
    parser.add_argument("--serve_slots", type=int, default=64,
                        help="serve: fixed concurrent-session capacity")
    parser.add_argument("--port", type=int, default=7654,
                        help="serve: TCP port for the socket front-end")
    parser.add_argument("--chunk_ms", type=float, default=16.0,
                        help="stream_eval chunk size in milliseconds")
    parser.add_argument("--half", action="store_true",
                        help="stream_eval in bfloat16 (serving mode)")
    parser.add_argument("--pcm16", action="store_true",
                        help="serve: move per-tick audio host<->device as "
                             "int16 PCM (half the transfer bytes; "
                             "conversions inside the jitted step)")
    parser.add_argument("--mk_kernel", action="store_true",
                        help="stream_eval with the wide-center masker "
                             "kernel (DPARN_Mout)")
    parser.add_argument("--fused", action="store_true",
                        help="stream_eval with Pallas fused recurrences")
    parser.add_argument("--backend", type=str, default="tpu",
                        choices=["cpu", "tpu"])
    parser.add_argument("--batch_eval", type=int, default=0,
                        help="dev: bucketed+jitted batched inference at "
                             "this batch size (0 = per-utterance); "
                             "recommended on TPU (batch_eval.py)")
    parser.add_argument("--eval_quantum", type=float, default=1.0,
                        help="batch_eval: length-bucket grid in "
                             "seconds (fewer compiles when larger)")
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--coordinator", type=str, default="localhost:12345",
                        help="multi-host: process-0 address host:port")
    parser.add_argument("--num_processes", type=int, default=1,
                        help="multi-host training: total process count "
                             "(launch this CLI once per host)")
    parser.add_argument("--process_id", type=int, default=0,
                        help="multi-host training: this host's rank")
    main(parser.parse_args())
