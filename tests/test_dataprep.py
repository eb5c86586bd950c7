"""Data-prep smoke tests: parser.py end-to-end on a toy corpus + the
bundled LibriSpeech metadata tables (round-1 verdict item 9)."""
import os
import subprocess
import sys

import numpy as np

from puresound_tpu.src.audio import AudioIO

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOCAL = os.path.join(REPO, "egs", "tse", "local")
SR = 8000


def _toy_corpus(tmp_path):
    """Two-speaker toy corpus in LibriSpeech layout + metadata + a
    Libri2Mix-style mixture csv."""
    corpus = tmp_path / "corpus"
    rows = []
    rng = np.random.default_rng(0)
    for spk, gender in (("11", "M"), ("22", "F")):
        for j in range(3):
            rel = f"{spk}/1/{spk}-1-{j:04d}.wav"
            path = corpus / rel
            os.makedirs(path.parent, exist_ok=True)
            wav = (0.2 * np.sin(2 * np.pi * (100 + 50 * int(spk[0])) / SR
                                * np.arange(SR))).astype(np.float32)
            AudioIO.save(wav.reshape(1, -1), str(path), SR)
            rows.append(f"{spk}-1-{j:04d}, {spk}, {gender}, {rel}, {SR}, {SR}, 1")
    meta = tmp_path / "librispeech_toy.csv"
    meta.write_text("uttid, spkid, gender, path, length, sample rate, channels\n"
                    + "\n".join(rows) + "\n")

    mixdir = tmp_path / "mix"
    os.makedirs(mixdir, exist_ok=True)
    mix_rows = ["mixture_ID,mixture_path,source_1_path,source_2_path,length"]
    for j in range(2):
        u1, u2 = f"11-1-{j:04d}", f"22-1-{j:04d}"
        mixp = mixdir / f"m{j}.wav"
        a, _ = AudioIO.open(str(corpus / f"11/1/{u1}.wav"))
        b, _ = AudioIO.open(str(corpus / f"22/1/{u2}.wav"))
        AudioIO.save(a + b, str(mixp), SR)
        mix_rows.append(f"{u1}_{u2},{mixp},{corpus / f'11/1/{u1}.wav'},"
                        f"{corpus / f'22/1/{u2}.wav'},{SR}")
    mixcsv = tmp_path / "mixture_dev_mix_clean.csv"
    mixcsv.write_text("\n".join(mix_rows) + "\n")
    return corpus, meta, mixcsv


def test_parser_end_to_end(tmp_path):
    corpus, meta, mixcsv = _toy_corpus(tmp_path)
    out = tmp_path / "manifest"
    subprocess.run(
        [sys.executable, os.path.join(LOCAL, "parser.py"), str(mixcsv),
         str(out), str(meta), str(corpus)],
        check=True, cwd=LOCAL)
    for fname in ("wav2scp.txt", "wav2ref.txt", "ref2spk.txt",
                  "wav2spk.txt", "ref2list.txt"):
        assert (out / fname).is_file(), fname
    scp = (out / "wav2scp.txt").read_text().strip().splitlines()
    assert len(scp) == 4  # 2 mixtures x 2 target speakers

    # the manifests must be loadable by the actual dataset
    from puresound_tpu.tasks.tse import TseCollateFunc, TseDataset

    ds = TseDataset(folder=str(out), resample_to=SR, max_length=1,
                    enroll_rule="fixed_length", enroll_augment=False)
    batch = TseCollateFunc()([ds[0], ds[1]])
    assert np.isfinite(batch["process_wav"]).all()


def test_bundled_librispeech_metadata_loads():
    """The bundled tables must parse into the speaker pool structure the
    parser consumes (reference bundles the same tables)."""
    sys.path.insert(0, LOCAL)
    try:
        from parser import Parser
    finally:
        sys.path.remove(LOCAL)
    meta = Parser.read_librispeech_metadata(
        os.path.join(LOCAL, "librispeech_metadata", "dev-clean"))
    assert len(meta) == 40  # dev-clean has 40 speakers
    spk = meta["1272"]
    assert spk["gender"] in ("M", "F")
    assert any(u.startswith("1272-128104") for u in spk["utts"])
    # every split file is present and parses
    for split in ("dev-other", "test-clean", "test-other", "train-clean-100"):
        m = Parser.read_librispeech_metadata(
            os.path.join(LOCAL, "librispeech_metadata", split))
        assert len(m) > 30, split
