"""TSE recipe CLI: train / dev / eval / tSNE / export_model / stream_eval
/ serve.

Parity: reference egs/tse/main.py:449-466 (same actions, same manifests,
same scoring); `export_model` serializes jax.export StableHLO artifacts of
the four sub-nets instead of torch.jit traces; `stream_eval` (chunked
real-time streaming inference + RTF) and `serve` (TCP socket serving
front-end with per-connection enrollment) are beyond the reference.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def get_model_variables(model, hparam):
    """Initialize a variable tree for inference-shaped inputs."""
    import jax
    import jax.numpy as jnp

    from puresound_tpu.nnet.base_nn import SoTaskWrapModule

    sr = hparam["DATASET"]["sample_rate"]
    x = jnp.zeros((1, sr))
    return model.init(jax.random.PRNGKey(0), x, x,
                      method=SoTaskWrapModule.inference)


def load_eval_model(hparam, ckpt_name):
    """Build the zoo model (no losses) and load checkpoint params
    (TRAIN.model_average: N averages the last N epoch ckpts)."""
    from model import init_model

    from puresound_tpu.tasks.base import BaseTrainer

    model = init_model(hparam["MODEL"]["type"])
    variables = get_model_variables(model, hparam)
    variables = BaseTrainer.resolve_eval_params(hparam, ckpt_name, variables)
    return model, variables


def init_dataloader(hparam):
    from puresound_tpu.src.sampler import SpeakerSampler
    from puresound_tpu.tasks.base import DataLoader
    from puresound_tpu.tasks.tse import TseCollateFunc, TseDataset

    is_vad = hparam["DATASET"]["type"].lower() == "pvad"
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
        enroll_augment=hparam["DATASET"]["enroll_augment"],
        enroll_rule=hparam["DATASET"]["enroll_rule"],
        is_vad_dataset=is_vad,
    )
    train_kw = dict(common)
    if hparam["DATASET"].get("augment_on_device"):
        # RIR / noise / volume move into the jitted train step
        # (puresound_tpu/src/augment_jax.py); workers keep decode, crop,
        # speed, biquad and enrollment handling. Dev stays on the host
        # chain so dev losses are comparable across modes.
        train_kw.update(noise_folder=None, rir_folder=None,
                        vol_perturbed=None)
    train_ds = TseDataset(folder=hparam["DATASET"]["train"],
                          single_spk_pb=hparam["DATASET"]["single_spk_prob"],
                          inactive_training=hparam["DATASET"]["inactive_training"],
                          **train_kw)
    dev_ds = TseDataset(folder=hparam["DATASET"]["dev"], single_spk_pb=0.0,
                        inactive_training=0.0, **common)

    if hparam["TRAIN"]["contrastive_learning"]:
        p_spks, p_utts = hparam["TRAIN"]["p_spks"], hparam["TRAIN"]["p_utts"]
        repeat = hparam["TRAIN"]["repeat"]
        train_sampler = SpeakerSampler(train_ds.sampler_meta(),
                                       repeat * len(train_ds) // (p_spks * p_utts),
                                       n_spks=p_spks, n_per=p_utts)
        dev_sampler = SpeakerSampler(dev_ds.sampler_meta(),
                                     repeat * len(dev_ds) // (p_spks * p_utts),
                                     n_spks=p_spks, n_per=p_utts)
        n_work = int(hparam["TRAIN"].get("num_workers", 0))
        train_loader = DataLoader(train_ds, batch_sampler=train_sampler,
                                  collate_fn=TseCollateFunc(),
                                  num_workers=n_work)
        dev_loader = DataLoader(dev_ds, batch_sampler=dev_sampler,
                                collate_fn=TseCollateFunc(),
                                num_workers=n_work)
    else:
        n_work = int(hparam["TRAIN"].get("num_workers", 0))
        # TRAIN.seed: reproducible batch order/augment draws; multi-process
        # runs shard each global batch across processes (multihost.py)
        import jax

        kw = dict(seed=hparam["TRAIN"].get("seed"))
        if jax.process_count() > 1:
            kw = dict(shard=(jax.process_index(), jax.process_count()),
                      seed=int(hparam["TRAIN"].get("seed") or 0))
        train_loader = DataLoader(train_ds, batch_size=hparam["TRAIN"]["batch_size"],
                                  shuffle=True, collate_fn=TseCollateFunc(),
                                  num_workers=n_work, **kw)
        dev_loader = DataLoader(dev_ds, batch_size=hparam["TRAIN"]["batch_size"],
                                shuffle=True, collate_fn=TseCollateFunc(),
                                num_workers=n_work, **kw)
    return train_loader, dev_loader


def action_train(hparam, backend):
    import jax
    import jax.numpy as jnp

    from model import init_loss, init_model

    from puresound_tpu.tasks.tse import TseTask

    losses = init_loss(hparam)
    if len(losses) == 3:
        sig_loss, cls_loss, other_loss = losses
    else:
        sig_loss, cls_loss = losses
        other_loss = None
    model = init_model(hparam["MODEL"]["type"], sig_loss, cls_loss, other_loss)

    def init_fn():
        sr = hparam["DATASET"]["sample_rate"]
        L = sr * (hparam["DATASET"]["max_length"] or 1)
        B = 2
        kwargs = dict(noisy=jnp.zeros((B, L)), enroll=jnp.zeros((B, L)),
                      ref_clean=jnp.zeros((B, L)), train=False)
        if model.task in (1, 2, 3):
            kwargs["spk_class"] = jnp.zeros((B,), jnp.int32)
        return model.init({"params": jax.random.PRNGKey(0)}, **kwargs)

    train_loader, dev_loader = init_dataloader(hparam)
    trainer = TseTask(hparam, model, init_fn, backend, train_loader, dev_loader)
    trainer.train()


def action_dev(hparam, backend, ckpt, metrics, batch_eval=0,
               eval_quantum=1.0):
    import jax.numpy as jnp

    from local.binarize import Binarize

    from puresound_tpu.nnet.base_nn import SoTaskWrapModule
    from puresound_tpu.src.metrics import Metrics
    from puresound_tpu.tasks.base import DataLoader
    from puresound_tpu.tasks.tse import TseCollateFunc, TseDataset

    is_vad = hparam["DATASET"]["type"].lower() == "pvad"
    dev_ds = TseDataset(folder=hparam["DATASET"]["dev"],
                        resample_to=hparam["DATASET"]["sample_rate"],
                        max_length=None, rir_mode=hparam["DATASET"]["rir_mode"] or "image",
                        enroll_rule=hparam["DATASET"]["enroll_rule"],
                        is_vad_dataset=is_vad)
    loader = DataLoader(dev_ds, batch_size=1, shuffle=False,
                        collate_fn=TseCollateFunc())
    model, variables = load_eval_model(hparam, ckpt)

    def infer(noisy, enroll):
        return model.apply(variables, jnp.asarray(noisy), jnp.asarray(enroll),
                           method=SoTaskWrapModule.inference)

    def scored_pairs():
        """Yield (batch, enh[1, ...]) in manifest order. With
        --batch_eval N, inference runs bucketed+padded+jitted at batch N
        (one XLA compile per length bucket instead of per utterance)."""
        if batch_eval > 0:
            from puresound_tpu.tasks.batch_eval import BucketedBatchRunner

            batches = list(loader)
            sr = hparam["DATASET"]["sample_rate"]
            # enrollments get a 4x coarser grid: bucket keys are the
            # (mix, enroll) cross product, and enroll lengths vary
            # continuously — a fine grid would compile per utterance
            runner = BucketedBatchRunner(
                lambda n, e: model.apply(variables, n, e,
                                         method=SoTaskWrapModule.inference),
                batch_size=batch_eval,
                quantum=(int(sr * eval_quantum),
                         int(sr * eval_quantum * 4)),
                pad_modes=("zero", "tile"))
            outs = runner.run([(b["process_wav"], b["enroll_wav"])
                               for b in batches])
            print(f"batch_eval: {len(runner.bucket_keys)} bucket shapes "
                  f"for {len(batches)} utterances")
            for b, o in zip(batches, outs):
                yield b, np.asarray(o)[None]
        else:
            for b in loader:
                yield b, np.asarray(infer(b["process_wav"],
                                          b["enroll_wav"]))

    if is_vad:
        binarizer = Binarize(threshold=0.5, stability=0.05,
                             sample_rate=hparam["DATASET"]["sample_rate"],
                             mode="moving_average")
        acc, prec, rec, f1 = [], [], [], []
        print("accuracy, precision, recall, f1_score")
        for batch, enh in scored_pairs():
            binarized = binarizer(enh)
            score = Metrics.f1_score(batch["clean_wav"], binarized.astype(np.float32))
            acc.append(score["accuracy"])
            prec.append(score["precision"])
            rec.append(score["recall"])
            f1.append(score["f1_score"])
            print(f"{batch['uttid'][0]}, {acc[-1]}, {prec[-1]}, {rec[-1]}, {f1[-1]}")
        print(f"accuracy: {np.mean(acc)}")
        print(f"precision: {np.mean(prec)}")
        print(f"recall: {np.mean(rec)}")
        print(f"f1_score: {np.mean(f1)}")
        return

    S_pesq, S_stoi, S_sdr, S_sisnr, S_sisnri, S_nsr, S_nsr_neg = ([] for _ in range(7))
    print("uttid, PESQ, STOI, SDR, SISNR, SISNRi, NSR")
    for batch, enh in scored_pairs():
        clean, noisy = batch["clean_wav"], batch["process_wav"]
        _sisnr = Metrics.sisnr(clean, enh)
        _sisnri = Metrics.sisnr_imp(clean, enh, noisy)
        _nsr = 1 if (_sisnri < 0 and _sisnr < 30) else 0
        _nsr_neg = 1 if (_nsr and _sisnr < 0) else 0
        S_sisnr.append(_sisnr)
        S_sisnri.append(_sisnri)
        S_nsr.append(_nsr)
        S_nsr_neg.append(_nsr_neg)
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
              f"{S_sisnr[-1]}, {S_sisnri[-1]}, {S_nsr[-1]}")
    print(f"PESQ: {np.mean(S_pesq)}")
    print(f"STOI: {np.mean(S_stoi)}")
    print(f"SDR: {np.mean(S_sdr)}")
    print(f"SiSNR: {np.mean(S_sisnr)}")
    print(f"SiSNRi: {np.mean(S_sisnri)}")
    print(f"NSR: {np.mean(S_nsr)}")
    print(f"NSR-negative: {np.mean(S_nsr_neg)}")


def action_tsne(hparam, backend, ckpt):
    import jax.numpy as jnp
    from sklearn import manifold
    from sklearn.metrics import silhouette_score

    from puresound_tpu.nnet.base_nn import SoTaskWrapModule
    from puresound_tpu.src.utils import load_text_as_dict
    from puresound_tpu.tasks.base import DataLoader
    from puresound_tpu.tasks.tse import TseCollateFunc, TseDataset

    dev_ds = TseDataset(folder=hparam["DATASET"]["dev"],
                        resample_to=hparam["DATASET"]["sample_rate"],
                        max_length=None, rir_mode=hparam["DATASET"]["rir_mode"] or "image",
                        enroll_rule=hparam["DATASET"]["enroll_rule"])
    loader = DataLoader(dev_ds, batch_size=1, shuffle=False,
                        collate_fn=TseCollateFunc())
    model, variables = load_eval_model(hparam, ckpt)
    spk_dct = load_text_as_dict(f"{hparam['DATASET']['dev']}/ref2spk.txt")
    spk_list, dvec_list, uttids = [], [], []
    for batch in loader:
        dvec = model.apply(variables, jnp.asarray(batch["enroll_wav"]),
                           method=SoTaskWrapModule.inference_tse_embedding)
        spk_list.append(spk_dct[batch["uttid"][0]][0])
        uttids.append(batch["uttid"][0])
        dvec_list.append(np.asarray(dvec).reshape(-1))
    print(f"silhouette: {silhouette_score(dvec_list, spk_list)}")
    perplexity = min(30.0, max(1.0, len(dvec_list) - 1))
    tsne = manifold.TSNE(n_components=2, init="random", random_state=5,
                         perplexity=perplexity,
                         verbose=1).fit_transform(np.stack(dvec_list))
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    spk_idx = {s: i for i, s in enumerate(sorted(set(spk_list)))}
    colors = [spk_idx[s] for s in spk_list]
    plt.figure(figsize=(8, 8))
    plt.scatter(tsne[:, 0], tsne[:, 1], c=colors, cmap="tab20", alpha=0.5)
    plt.xticks([])
    plt.yticks([])
    out = f"{hparam['TRAIN']['model_save_dir']}/Speaker_dev_tSNE.png"
    plt.savefig(out)
    print(f"saved {out}")

    # interactive HTML (reference: plotly at egs/tse/main.py:283-348;
    # here a dependency-free SVG/JS page with the same interactions)
    from puresound_tpu.utils.scatter_html import write_scatter_html

    html = f"{hparam['TRAIN']['model_save_dir']}/Speaker_dev_tSNE.html"
    write_scatter_html(html, tsne, spk_list, uttids,
                       title="Speaker dev t-SNE")
    print(f"saved {html}")


def action_eval(hparam, backend, ckpt, batch_eval=0, eval_quantum=1.0):
    import jax.numpy as jnp

    from local.binarize import Binarize

    from puresound_tpu.nnet.base_nn import SoTaskWrapModule
    from puresound_tpu.src.audio import AudioIO
    from puresound_tpu.src.utils import create_folder, load_text_as_dict

    out_dir = f"{hparam['TRAIN']['model_save_dir']}/eval_audio"
    create_folder(out_dir)
    model, variables = load_eval_model(hparam, ckpt)
    test_audio = load_text_as_dict(f"{hparam['DATASET']['eval']}/wav2scp.txt")
    enroll_dct = load_text_as_dict(f"{hparam['DATASET']['eval']}/ref2list.txt")
    sr = hparam["DATASET"]["sample_rate"]
    is_vad = hparam["DATASET"]["type"].lower() == "pvad"
    post = Binarize(threshold=0.5, stability=0.05, sample_rate=sr,
                    mode="moving_average") if is_vad else None

    def load_pair(key):
        noisy, wav_sr = AudioIO.open(f_path=test_audio[key][0])
        if wav_sr != sr:
            noisy = AudioIO.resample(noisy, wav_sr, sr)
        enrolls = []
        for p in enroll_dct[key]:
            e, wav_sr = AudioIO.open(f_path=p, target_lvl=-28)
            if wav_sr != sr:
                e = AudioIO.resample(e, wav_sr, sr)
            enrolls.append(e)
        return np.asarray(noisy), np.concatenate(enrolls, axis=-1)

    def finish(key, enh):
        enh = np.asarray(enh).reshape(1, -1)
        if post is not None:
            enh = post(enh).astype(np.float32)
        AudioIO.save(enh.reshape(1, -1), f"{out_dir}/{key}.wav", sr)

    keys = list(test_audio.keys())
    if batch_eval > 0:
        from puresound_tpu.tasks.batch_eval import BucketedBatchRunner

        runner = BucketedBatchRunner(
            lambda n, e: model.apply(variables, n, e,
                                     method=SoTaskWrapModule.inference),
            batch_size=batch_eval,
            quantum=(int(sr * eval_quantum), int(sr * eval_quantum * 4)),
            pad_modes=("zero", "tile"))
        # macro-chunks keep peak host memory bounded on large test sets;
        # bucket executables persist across run() calls via the jit cache
        group = max(batch_eval * 8, 64)
        for start in range(0, len(keys), group):
            chunk = keys[start:start + group]
            items = [load_pair(k) for k in chunk]
            outs = runner.run(items)
            for k, o in zip(chunk, outs):
                print(f"Running inference: {k}")
                finish(k, o)
        return
    for key in keys:
        print(f"Running inference: {key}")
        noisy, enroll = load_pair(key)
        enh = np.asarray(model.apply(variables, jnp.asarray(noisy),
                                     jnp.asarray(enroll),
                                     method=SoTaskWrapModule.inference))
        finish(key, enh)


def action_export(hparam, backend, ckpt):
    """Serialize jax.export StableHLO artifacts (SpeakerNet, Encoder,
    decoder, MaskNet, FullModel, StreamStep) — the TPU equivalent of the
    reference's torch.jit traces (egs/tse/main.py:406-443)."""
    from puresound_tpu.utils.export import export_stablehlo

    model, variables = load_eval_model(hparam, ckpt)
    export_stablehlo(model, variables, hparam["DATASET"]["sample_rate"],
                     hparam["TRAIN"]["model_save_dir"], ckpt)


def action_serve(hparam, backend, ckpt, chunk_ms, n_slots, port,
                 half=False, fused=False, pcm16=False):
    """Production TSE serving: TCP front-end where each connection enrolls
    its own target speaker (HELLO payload = d-vector or enrollment
    waveform) and streams mixture audio for enhanced audio back."""
    from puresound_tpu.streaming.deploy import run_serve

    model, variables = load_eval_model(hparam, ckpt)
    run_serve(model, variables, n_slots, port=port, chunk_ms=chunk_ms,
              sr=hparam["DATASET"]["sample_rate"], half=half, fused=fused,
              pcm16=pcm16)


def action_stream_eval(hparam, backend, ckpt, chunk_ms, half=False):
    """Chunked real-time streaming TSE over the eval set: embed the
    enrollment once, stream the mixture, write aligned enhanced wavs and
    report per-utterance and average RTF."""
    import jax.numpy as jnp

    from puresound_tpu.src.audio import AudioIO
    from puresound_tpu.src.utils import create_folder, load_text_as_dict
    from puresound_tpu.streaming.file_eval import build_engine, stream_signal

    out_dir = f"{hparam['TRAIN']['model_save_dir']}/stream_eval_audio"
    create_folder(out_dir)
    model, variables = load_eval_model(hparam, ckpt)
    engine = build_engine(model)
    test_audio = load_text_as_dict(f"{hparam['DATASET']['eval']}/wav2scp.txt")
    enroll_dct = load_text_as_dict(f"{hparam['DATASET']['eval']}/ref2list.txt")
    sr = hparam["DATASET"]["sample_rate"]
    rtfs = []
    for key in test_audio.keys():
        noisy, wav_sr = AudioIO.open(f_path=test_audio[key][0])
        if wav_sr != sr:
            noisy = AudioIO.resample(noisy, wav_sr, sr)
        enrolls = []
        for p in enroll_dct[key]:
            e, wav_sr = AudioIO.open(f_path=p, target_lvl=-28)
            if wav_sr != sr:
                e = AudioIO.resample(e, wav_sr, sr)
            enrolls.append(e)
        enroll = np.concatenate(enrolls, axis=-1).reshape(1, -1)
        dvec = engine.apply(variables, jnp.asarray(enroll),
                            method=type(engine).embed)
        enh, rtf = stream_signal(engine, variables, np.asarray(noisy), sr,
                                 chunk_ms=chunk_ms, dvec=dvec, half=half)
        rtfs.append(rtf)
        print(f"Streamed {key}: RTF {rtf:.1f}x real time")
        AudioIO.save(enh.reshape(1, -1), f"{out_dir}/{key}.wav", sr)
    if rtfs:
        print(f"Average RTF over {len(rtfs)} utts: {np.mean(rtfs):.1f}x "
              f"({chunk_ms} ms chunks)")


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
        if hparam["TRAIN"].get("contrastive_learning"):
            raise NotImplementedError("SpeakerSampler batches are not "
                                      "process-sharded; use one host for "
                                      "contrastive training")
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
    elif config.action == "tSNE":
        action_tsne(hparam, config.backend, config.ckpt)
    elif config.action == "eval":
        action_eval(hparam, config.backend, config.ckpt,
                    config.batch_eval, config.eval_quantum)
    elif config.action == "export_model":
        action_export(hparam, config.backend, config.ckpt)
    elif config.action == "stream_eval":
        action_stream_eval(hparam, config.backend, config.ckpt,
                           config.chunk_ms, config.half)
    elif config.action == "serve":
        action_serve(hparam, config.backend, config.ckpt, config.chunk_ms,
                     config.serve_slots, config.port, config.half,
                     config.fused,
                     config.pcm16)
    else:
        raise NameError("Unrecognize action.")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("config_path", type=str)
    parser.add_argument("--action", type=str, default="train",
                        choices=["train", "dev", "eval", "tSNE",
                                 "export_model", "stream_eval", "serve"])
    parser.add_argument("--serve_slots", type=int, default=64,
                        help="serve: fixed concurrent-session capacity")
    parser.add_argument("--port", type=int, default=7654,
                        help="serve: TCP port for the socket front-end")
    parser.add_argument("--fused", action="store_true",
                        help="serve: fused Pallas SkiM serving kernel "
                             "(bf16 with --half)")
    parser.add_argument("--chunk_ms", type=float, default=16.0,
                        help="stream_eval chunk size in milliseconds")
    parser.add_argument("--half", action="store_true",
                        help="stream_eval in bfloat16 (serving mode)")
    parser.add_argument("--pcm16", action="store_true",
                        help="serve: move per-tick audio host<->device as "
                             "int16 PCM (half the transfer bytes; "
                             "conversions inside the jitted step)")
    parser.add_argument("--backend", type=str, default="tpu",
                        choices=["cpu", "tpu"])
    parser.add_argument("--metrics", type=str, default="simple",
                        choices=["simple", "detail"])
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
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--coordinator", type=str, default="localhost:12345",
                        help="multi-host: process-0 address host:port")
    parser.add_argument("--num_processes", type=int, default=1,
                        help="multi-host training: total process count "
                             "(launch this CLI once per host)")
    parser.add_argument("--process_id", type=int, default=0,
                        help="multi-host training: this host's rank")
    main(parser.parse_args())
