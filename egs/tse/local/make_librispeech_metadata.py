"""Generate LibriSpeech metadata CSVs for the TSE manifest parser.

The reference bundles pre-generated CSVs (egs/tse/local/librispeech_metadata);
this script produces the same format directly from a LibriSpeech corpus
tree, so no data files need to ship with the framework:

    uttid, spkid, gender, audio_path, length, sr, channels

Usage:
    python make_librispeech_metadata.py <librispeech_root>/<split> out.csv \
        [--speakers-file <librispeech_root>/SPEAKERS.TXT]
"""
import argparse
import io
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "..", ".."))

from puresound_tpu.src.audio import AudioIO
from puresound_tpu.src.utils import recursive_read_folder


def load_genders(speakers_file):
    genders = {}
    if not speakers_file or not os.path.isfile(speakers_file):
        return genders
    with io.open(speakers_file, "r", encoding="utf-8") as f:
        for line in f:
            if line.startswith(";"):
                continue
            parts = [p.strip() for p in line.split("|")]
            if len(parts) >= 2:
                genders[parts[0]] = parts[1]
    return genders


def main(config):
    genders = load_genders(config.speakers_file)
    flacs = []
    recursive_read_folder(config.corpus_split, ".flac", flacs)
    rows = []
    for entry in sorted(flacs):
        path = entry.strip().split(" ")[1]
        uttid = os.path.basename(path).rsplit(".", 1)[0]
        spkid = uttid.split("-")[0]
        sr, seconds, channels = AudioIO.audio_info(path)
        rel = os.path.relpath(path, config.relative_to) if config.relative_to else path
        rows.append(f"{uttid}, {spkid}, {genders.get(spkid, 'U')}, {rel}, "
                    f"{seconds}, {sr}, {channels}")
    with io.open(config.output_csv, "w", encoding="utf-8") as f:
        f.write("uttid, spkid, gender, audio_path, length, sr, channels\n")
        f.write("\n".join(rows) + "\n")
    print(f"wrote {len(rows)} rows to {config.output_csv}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("corpus_split", type=str,
                        help="e.g. LibriSpeech/train-clean-100")
    parser.add_argument("output_csv", type=str)
    parser.add_argument("--speakers-file", type=str, default=None)
    parser.add_argument("--relative-to", type=str, default=None)
    main(parser.parse_args())
