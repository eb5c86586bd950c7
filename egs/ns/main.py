"""NS recipe CLI: train / dev / eval / stream_eval / serve.

Parity: reference egs/ns/main.py:184-198 (same actions, manifests, metrics);
stream_eval (chunked real-time streaming inference + RTF) and serve (TCP
socket serving front-end over the batched SessionServer) are beyond the
reference.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def get_model_variables(model, hparam):
    import jax
    import jax.numpy as jnp

    from puresound_tpu.nnet.base_nn import SoTaskWrapModule

    sr = hparam["DATASET"]["sample_rate"]
    return model.init(jax.random.PRNGKey(0), jnp.zeros((1, sr)),
                      method=SoTaskWrapModule.inference)


def load_eval_model(hparam, ckpt_name):
    """Build the zoo model and load checkpoint params
    (TRAIN.model_average: N averages the last N epoch ckpts)."""
    from model import init_model

    from puresound_tpu.tasks.base import BaseTrainer

    model = init_model(hparam["MODEL"]["type"])
    variables = get_model_variables(model, hparam)
    variables = BaseTrainer.resolve_eval_params(hparam, ckpt_name, variables)
    return model, variables


def init_dataloader(hparam):
    from puresound_tpu.tasks.base import DataLoader
    from puresound_tpu.tasks.ns import NsCollateFunc, NsDataset

    common = dict(
        resample_to=hparam["DATASET"]["sample_rate"],
        max_length=hparam["DATASET"]["max_length"],
        noise_folder=hparam["DATASET"]["noise_folder"],
        rir_folder=hparam["DATASET"]["rir_folder"],
        rir_mode=hparam["DATASET"]["rir_mode"] or "image",
        speed_perturbed=hparam["DATASET"]["speed_perturbed"],
        perturb_frequency_response=hparam["DATASET"].get(
            "perturb_frequency_response", False),
        vol_perturbed=hparam["DATASET"]["vol_perturbed"],
    )
    train_kw = dict(common)
    if hparam["DATASET"].get("augment_on_device"):
        # RIR / noise / volume move into the jitted train step
        # (puresound_tpu/src/augment_jax.py); workers keep only decode,
        # crop, speed and the biquad response. Dev stays on the host
        # chain so dev losses are comparable across modes.
        train_kw.update(noise_folder=None, rir_folder=None,
                        vol_perturbed=None)
    train_ds = NsDataset(folder=hparam["DATASET"]["train"], **train_kw)
    dev_ds = NsDataset(folder=hparam["DATASET"]["dev"], **common)
    n_work = int(hparam["TRAIN"].get("num_workers", 0))
    # TRAIN.seed makes the whole run reproducible: batch order + per-batch
    # augmentation draws (worker-count invariant; DataLoader docstring)
    kw = dict(seed=hparam["TRAIN"].get("seed"))
    import jax

    if jax.process_count() > 1:
        # each process loads its slice of the global batch in lockstep
        kw = dict(shard=(jax.process_index(), jax.process_count()),
                  seed=int(hparam["TRAIN"].get("seed") or 0))
    train = DataLoader(train_ds, batch_size=hparam["TRAIN"]["batch_size"],
                       shuffle=True, collate_fn=NsCollateFunc(),
                       num_workers=n_work, **kw)
    dev = DataLoader(dev_ds, batch_size=hparam["TRAIN"]["batch_size"],
                     shuffle=True, collate_fn=NsCollateFunc(),
                     num_workers=n_work, **kw)
    return train, dev


def action_train(hparam, backend):
    import jax
    import jax.numpy as jnp

    from model import init_loss, init_model

    from puresound_tpu.tasks.ns import NsTask

    sig_loss = init_loss(hparam)
    model = init_model(hparam["MODEL"]["type"], sig_loss)

    def init_fn():
        sr = hparam["DATASET"]["sample_rate"]
        L = sr * (hparam["DATASET"]["max_length"] or 1)
        return model.init({"params": jax.random.PRNGKey(0)},
                          noisy=jnp.zeros((2, L)), enroll=None,
                          ref_clean=jnp.zeros((2, L)), train=False)

    train_loader, dev_loader = init_dataloader(hparam)
    trainer = NsTask(hparam, model, init_fn, backend, train_loader, dev_loader)
    trainer.train()


def action_dev(hparam, backend, ckpt, metrics, batch_eval=0,
               eval_quantum=1.0):
    import jax.numpy as jnp

    from puresound_tpu.nnet.base_nn import SoTaskWrapModule
    from puresound_tpu.src.metrics import Metrics
    from puresound_tpu.tasks.base import DataLoader
    from puresound_tpu.tasks.ns import NsCollateFunc, NsDataset

    dev_ds = NsDataset(folder=hparam["DATASET"]["dev"],
                       resample_to=hparam["DATASET"]["sample_rate"],
                       max_length=None)
    loader = DataLoader(dev_ds, batch_size=1, shuffle=False,
                        collate_fn=NsCollateFunc())
    model, variables = load_eval_model(hparam, ckpt)

    def scored_pairs():
        """Yield (batch, enh[1, L]) in manifest order; with --batch_eval N,
        inference runs bucketed+padded+jitted at batch N (one XLA compile
        per length bucket instead of per utterance)."""
        if batch_eval > 0:
            from puresound_tpu.tasks.batch_eval import BucketedBatchRunner

            batches = list(loader)
            runner = BucketedBatchRunner(
                lambda n: model.apply(variables, n,
                                      method=SoTaskWrapModule.inference),
                batch_size=batch_eval,
                quantum=int(hparam["DATASET"]["sample_rate"] * eval_quantum),
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
                    method=SoTaskWrapModule.inference))

    S_pesq, S_stoi, S_sdr, S_sisnr, S_sisnri = [], [], [], [], []
    print("uttid, PESQ, STOI, SDR, SISNR, SISNRi")
    for batch, enh in scored_pairs():
        clean, noisy = batch["clean_wav"], batch["process_wav"]
        S_sisnr.append(Metrics.sisnr(clean, enh))
        S_sisnri.append(Metrics.sisnr_imp(clean, enh, noisy))
        if metrics == "detail":
            try:
                S_pesq.append(Metrics.pesq_wb(clean, enh))
            except ValueError:  # utterance too short for PESQ (< 0.25 s)
                S_pesq.append(0)
            S_stoi.append(Metrics.stoi(clean, enh))
            S_sdr.append(Metrics.bss_sdr(clean, enh))
        else:
            S_pesq.append(0)
            S_stoi.append(0)
            S_sdr.append(0)
        print(f"{batch['uttid'][0]}, {S_pesq[-1]}, {S_stoi[-1]}, {S_sdr[-1]}, "
              f"{S_sisnr[-1]}, {S_sisnri[-1]}")
    print(f"PESQ: {np.mean(S_pesq)}")
    print(f"STOI: {np.mean(S_stoi)}")
    print(f"SDR: {np.mean(S_sdr)}")
    print(f"SiSNR: {np.mean(S_sisnr)}")
    print(f"SiSNRi: {np.mean(S_sisnri)}")


def action_eval(hparam, backend, ckpt, batch_eval=0, eval_quantum=1.0):
    import jax.numpy as jnp

    from puresound_tpu.nnet.base_nn import SoTaskWrapModule
    from puresound_tpu.src.audio import AudioIO
    from puresound_tpu.src.utils import create_folder, load_text_as_dict

    out_dir = f"{hparam['TRAIN']['model_save_dir']}/eval_audio"
    create_folder(out_dir)
    model, variables = load_eval_model(hparam, ckpt)
    test_audio = load_text_as_dict(f"{hparam['DATASET']['eval']}/wav2scp.txt")
    sr = hparam["DATASET"]["sample_rate"]

    def load_noisy(key):
        noisy, wav_sr = AudioIO.open(f_path=test_audio[key][0])
        if wav_sr != sr:
            noisy = AudioIO.resample(noisy, wav_sr, sr)
        return np.asarray(noisy)

    keys = list(test_audio.keys())
    if batch_eval > 0:
        from puresound_tpu.tasks.batch_eval import BucketedBatchRunner

        runner = BucketedBatchRunner(
            lambda n: model.apply(variables, n,
                                  method=SoTaskWrapModule.inference),
            batch_size=batch_eval,
            quantum=int(sr * eval_quantum), pad_modes=("zero",))
        # macro-chunks bound peak host memory on large test sets; bucket
        # executables persist across run() calls via the jit cache
        group = max(batch_eval * 8, 64)
        for start in range(0, len(keys), group):
            chunk = keys[start:start + group]
            outs = runner.run([(load_noisy(k),) for k in chunk])
            for k, o in zip(chunk, outs):
                print(f"Running inference: {k}")
                AudioIO.save(np.asarray(o).reshape(1, -1),
                             f"{out_dir}/{k}.wav", sr)
        return
    for key in keys:
        print(f"Running inference: {key}")
        noisy = load_noisy(key)
        enh = np.asarray(model.apply(variables, jnp.asarray(noisy),
                                     method=SoTaskWrapModule.inference))
        AudioIO.save(enh.reshape(1, -1), f"{out_dir}/{key}.wav", sr)


def action_stream_eval(hparam, backend, ckpt, chunk_ms,
                       half=False, fused=False, dp_kernel=False,
                       attn_kernel=False, mk_kernel=False):
    """Chunked real-time streaming inference over the eval set: enhanced
    wavs (aligned with the input) + per-utterance and average RTF."""
    from puresound_tpu.src.audio import AudioIO
    from puresound_tpu.src.utils import create_folder, load_text_as_dict
    from puresound_tpu.streaming.file_eval import build_engine, stream_signal

    out_dir = f"{hparam['TRAIN']['model_save_dir']}/stream_eval_audio"
    create_folder(out_dir)
    model, variables = load_eval_model(hparam, ckpt)
    engine = build_engine(model)
    test_audio = load_text_as_dict(f"{hparam['DATASET']['eval']}/wav2scp.txt")
    sr = hparam["DATASET"]["sample_rate"]
    rtfs = []
    for key in test_audio.keys():
        noisy, wav_sr = AudioIO.open(f_path=test_audio[key][0])
        if wav_sr != sr:
            noisy = AudioIO.resample(noisy, wav_sr, sr)
        enh, rtf = stream_signal(engine, variables, np.asarray(noisy), sr,
                                 chunk_ms=chunk_ms, half=half, fused=fused,
                                 dp_kernel=dp_kernel, attn_kernel=attn_kernel,
                                 mk_kernel=mk_kernel)
        rtfs.append(rtf)
        print(f"Streamed {key}: RTF {rtf:.1f}x real time")
        AudioIO.save(enh.reshape(1, -1), f"{out_dir}/{key}.wav", sr)
    if rtfs:
        print(f"Average RTF over {len(rtfs)} utts: {np.mean(rtfs):.1f}x "
              f"({chunk_ms} ms chunks)")


def action_serve(hparam, backend, ckpt, chunk_ms, n_slots, port,
                 half=False, fused=False, dp_kernel=False,
                 attn_kernel=False, mk_kernel=False, pcm16=False):
    """Production serving: load the checkpoint, open the TCP front-end
    (streaming/socket_server.py protocol), serve until Ctrl-C."""
    from puresound_tpu.streaming.deploy import run_serve

    model, variables = load_eval_model(hparam, ckpt)
    run_serve(model, variables, n_slots, port=port, chunk_ms=chunk_ms,
              sr=hparam["DATASET"]["sample_rate"], half=half, fused=fused,
              dp_kernel=dp_kernel, attn_kernel=attn_kernel,
              mk_kernel=mk_kernel, pcm16=pcm16)


def action_export(hparam, backend, ckpt):
    """Serialize jax.export StableHLO artifacts (EncoderNet, MaskNet,
    decoderNet, FullModel, StreamStep). The reference exports TSE models
    only (/root/reference/egs/tse/main.py:406-443); NS gets the same
    deployment story here."""
    from puresound_tpu.utils.export import export_stablehlo

    model, variables = load_eval_model(hparam, ckpt)
    export_stablehlo(model, variables, hparam["DATASET"]["sample_rate"],
                     hparam["TRAIN"]["model_save_dir"], ckpt)


def main(config):
    from puresound_tpu.src.utils import create_folder, load_hparam

    hparam = load_hparam(config.config_path)
    create_folder(hparam["TRAIN"]["model_save_dir"])
    if config.num_processes > 1:
        # multi-host data parallelism: one process per host, global mesh
        # (parallel/multihost.py); must run before first device use
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
        action_dev(hparam, config.backend, config.ckpt, config.metrics,
                   config.batch_eval, config.eval_quantum)
    elif config.action == "eval":
        action_eval(hparam, config.backend, config.ckpt,
                    config.batch_eval, config.eval_quantum)
    elif config.action == "stream_eval":
        action_stream_eval(hparam, config.backend, config.ckpt,
                           config.chunk_ms, config.half, config.fused,
                           config.dp_kernel, config.attn_kernel,
                           config.mk_kernel)
    elif config.action == "serve":
        action_serve(hparam, config.backend, config.ckpt, config.chunk_ms,
                     config.serve_slots, config.port, config.half,
                     config.fused, config.dp_kernel, config.attn_kernel,
                     config.mk_kernel, config.pcm16)
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
    parser.add_argument("--fused", action="store_true",
                        help="stream_eval with Pallas fused recurrences")
    parser.add_argument("--dp_kernel", action="store_true",
                        help="stream_eval with the fused dual-path "
                             "bottleneck kernel (DPCRN; fastest)")
    parser.add_argument("--attn_kernel", action="store_true",
                        help="stream_eval with the fused intra-attention "
                             "kernel (DPARN; fastest)")
    parser.add_argument("--mk_kernel", action="store_true",
                        help="stream_eval with the center-fused masker "
                             "kernel (DPCRN/DPARN: d4 conv + bottleneck "
                             "+ u0 in one Pallas call)")
    parser.add_argument("--backend", type=str, default="tpu",
                        choices=["cpu", "tpu"])
    parser.add_argument("--batch_eval", type=int, default=0,
                        help="dev/eval: bucketed+jitted batched inference at "
                             "this batch size (0 = per-utterance, the "
                             "reference behavior); recommended on TPU. "
                             "Scores can shift slightly: the final "
                             "analysis window of each utterance sees "
                             "padded framing (batch_eval.py docstring)")
    parser.add_argument("--eval_quantum", type=float, default=1.0,
                        help="batch_eval: length-bucket grid in "
                             "seconds (fewer compiles when larger)")
    parser.add_argument("--metrics", type=str, default="simple",
                        choices=["simple", "detail"])
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--coordinator", type=str, default="localhost:12345",
                        help="multi-host: process-0 address host:port")
    parser.add_argument("--num_processes", type=int, default=1,
                        help="multi-host training: total process count "
                             "(launch this CLI once per host)")
    parser.add_argument("--process_id", type=int, default=0,
                        help="multi-host training: this host's rank")
    main(parser.parse_args())
