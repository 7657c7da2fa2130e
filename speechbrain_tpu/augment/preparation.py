"""Noise/RIR dataset preparation.

Capability parity with the reference's ``speechbrain/augment/preparation.py``
(prepare_dataset_from_URL :23): download (or locate) an archive of wavs
and write the CSV manifest AddNoise/AddReverb consume.
"""

import csv
import os

from speechbrain_tpu.utils.logger import get_logger

logger = get_logger(__name__)


def write_csv(wav_list, csv_file):
    """Write [ID, duration, wav] rows for a list of wav paths."""
    from speechbrain_tpu.dataio.dataio import read_audio_info

    with open(csv_file, "w", newline="", encoding="utf-8") as f:
        writer = csv.writer(f)
        writer.writerow(["ID", "duration", "wav"])
        for i, path in enumerate(wav_list):
            frames, sr, _ = read_audio_info(path)
            writer.writerow([f"noise_{i}", frames / sr, path])


def prepare_dataset_from_URL(URL, dest_folder, ext="wav", csv_file=None):
    """Download + unpack + manifest a noise/RIR dataset
    (reference preparation.py:23). With no network, point URL at a local
    archive or directory."""
    from speechbrain_tpu.utils.data_utils import download_file, get_all_files

    os.makedirs(dest_folder, exist_ok=True)
    if os.path.isdir(URL):
        data_dir = URL
    else:
        archive = os.path.join(dest_folder, os.path.basename(URL))
        download_file(URL, archive, unpack=True, dest_unpack=dest_folder)
        data_dir = dest_folder
    wavs = get_all_files(data_dir, match_and=[f".{ext}"])
    if csv_file is not None:
        write_csv(wavs, csv_file)
        logger.info("Wrote %d entries to %s", len(wavs), csv_file)
    return wavs
