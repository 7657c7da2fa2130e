"""Tests for datasets, batching, samplers, encoders, audio IO."""

import numpy as np
import pytest

from speechbrain_tpu.dataio.batch import PaddedBatch
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.dataio.encoder import CategoricalEncoder, CTCTextEncoder, TextEncoder
from speechbrain_tpu.dataio.sampler import (
    DistributedSamplerWrapper,
    DynamicBatchSampler,
    ReproducibleRandomSampler,
)
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader, make_dataloader


@pytest.fixture
def dataset():
    data = {
        f"utt{i}": {"wav": np.ones(100 + 50 * i, dtype=np.float32) * i, "spk": f"s{i % 2}", "duration": 1.0 + i}
        for i in range(6)
    }
    return DynamicItemDataset(data)


def test_dataset_getitem(dataset):
    dataset.set_output_keys(["id", "wav"])
    item = dataset[2]
    assert item["id"] == "utt2"
    assert item["wav"].shape == (200,)


def test_dataset_dynamic_item(dataset):
    dataset.add_dynamic_item(lambda w: w * 2, takes="wav", provides="wav2")
    dataset.set_output_keys(["wav2"])
    assert dataset[1]["wav2"][0] == 2.0


def test_filtered_sorted(dataset):
    dataset.set_output_keys(["id"])
    view = dataset.filtered_sorted(sort_key="duration", reverse=True)
    assert view[0]["id"] == "utt5"
    view2 = dataset.filtered_sorted(key_max_value={"duration": 3.0})
    assert len(view2) == 3


def test_overfit_test(dataset):
    view = dataset.overfit_test(2, 10)
    assert len(view) == 10


def test_padded_batch_basics():
    batch = PaddedBatch(
        [
            {"id": "a", "x": np.ones(4, dtype=np.float32)},
            {"id": "b", "x": np.ones(8, dtype=np.float32)},
        ]
    )
    assert batch.x.data.shape == (2, 8)
    assert np.allclose(batch.x.lengths, [0.5, 1.0])
    assert batch.id == ["a", "b"]
    assert len(batch) == 2


def test_padded_batch_bucketing():
    batch = PaddedBatch(
        [{"x": np.ones(5, dtype=np.float32)}, {"x": np.ones(9, dtype=np.float32)}],
        pad_to_multiple=16,
    )
    assert batch.x.data.shape == (2, 16)
    assert np.allclose(batch.x.lengths, [5 / 16, 9 / 16])


def test_padded_batch_2d():
    batch = PaddedBatch(
        [{"feats": np.ones((4, 10))}, {"feats": np.ones((6, 10))}]
    )
    assert batch.feats.data.shape == (2, 6, 10)
    assert np.allclose(batch.feats.lengths, [4 / 6, 1.0])


def test_reproducible_sampler():
    s = ReproducibleRandomSampler(list(range(10)), seed=1)
    a = list(s)
    b = list(s)
    assert a == b  # same epoch -> same order
    s.set_epoch(1)
    c = list(s)
    assert a != c and sorted(c) == list(range(10))


def test_dynamic_batch_sampler(dataset):
    sampler = DynamicBatchSampler(
        dataset, max_batch_length=8.0, num_buckets=3, shuffle=False
    )
    batches = list(sampler)
    all_idx = sorted(i for b in batches for i in b)
    assert all_idx == list(range(6))
    for b in batches:
        durations = sampler.get_durations(b)
        assert sum(durations) <= 8.0 + max(durations)


def test_distributed_sampler_wrapper():
    base = list(range(10))
    shards = []
    for rank in range(4):
        w = DistributedSamplerWrapper(base, num_replicas=4, rank=rank)
        shards.append(list(w))
    lens = {len(s) for s in shards}
    assert len(lens) == 1  # equal steps on every host
    combined = [i for s in shards for i in s]
    assert set(combined) == set(range(10))


def test_saveable_dataloader_resume(tmp_path, dataset):
    dataset.set_output_keys(["id"])
    loader = SaveableDataLoader(dataset, batch_size=2, collate_fn=lambda x: x)
    it = iter(loader)
    first = next(it)
    path = tmp_path / "loader.ckpt"
    loader._save(path)
    # new loader resumes after the first batch
    loader2 = SaveableDataLoader(dataset, batch_size=2, collate_fn=lambda x: x)
    loader2._load(path, end_of_epoch=False)
    resumed = list(loader2)
    assert len(resumed) == 2  # 3 total batches, skipped 1
    assert resumed[0][0]["id"] == "utt2"


def test_make_dataloader_padded(dataset):
    dataset.set_output_keys(["id", "wav"])
    loader = make_dataloader(dataset, batch_size=3)
    batch = next(iter(loader))
    assert isinstance(batch, PaddedBatch)
    assert batch.wav.data.shape[0] == 3


def test_threaded_dataloader(dataset):
    dataset.set_output_keys(["id"])
    loader = SaveableDataLoader(dataset, batch_size=2, num_workers=2, collate_fn=lambda x: x)
    batches = list(loader)
    assert [b[0]["id"] for b in batches] == ["utt0", "utt2", "utt4"]


def test_categorical_encoder():
    enc = CategoricalEncoder()
    enc.update_from_iterable("abcd")
    assert len(enc) == 4
    seq = enc.encode_sequence(["a", "d"])
    assert enc.decode_ndim(seq) == ["a", "d"]
    with pytest.raises(KeyError):
        enc.encode_label("z")
    enc.add_unk()
    assert enc.encode_label("z") == enc.lab2ind["<unk>"]


def test_encoder_save_load(tmp_path):
    enc = CategoricalEncoder()
    enc.update_from_iterable(["x", "y"])
    path = tmp_path / "enc.txt"
    enc.save(path)
    enc2 = CategoricalEncoder()
    enc2.load(path)
    assert enc2.lab2ind == enc.lab2ind


def test_text_encoder_bos_eos():
    enc = TextEncoder()
    enc.update_from_iterable("abc")
    enc.insert_bos_eos(bos_index=0)
    assert enc.get_bos_index() == 0
    assert enc.get_eos_index() == 1
    assert len(enc) == 5


def test_ctc_encoder_collapse():
    enc = CTCTextEncoder()
    enc.update_from_iterable("ab")
    enc.insert_blank(index=0)
    blank = enc.get_blank_index()
    a, b = enc.encode_label("a"), enc.encode_label("b")
    collapsed = enc.collapse_indices_ndim([blank, a, a, blank, b, b])
    assert collapsed == [a, b]


def test_audio_roundtrip(tmp_path):
    from speechbrain_tpu.dataio.dataio import read_audio, write_audio

    sig = (np.sin(np.linspace(0, 40, 1600)) * 0.5).astype(np.float32)
    path = str(tmp_path / "test.wav")
    write_audio(path, sig, 16000)
    loaded = read_audio(path)
    assert loaded.shape == sig.shape
    assert np.abs(loaded - sig).max() < 1e-3
