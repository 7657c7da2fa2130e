#!/usr/bin/env python
"""Extract and cache SSL speech features for the SpeechLLM pipeline
(the reference's recipes/LibriSpeech/ASR/transformer/extract_ssl_feats.py
re-expressed for speechbrain_tpu).

The SSL encoder runs as ONE jitted TPU program over length-bucketed
waveforms (pad to a multiple of <pad_seconds> seconds -> a bounded set
of compiled shapes, instead of the reference's shape-per-utterance
device calls), and each utterance's features land in an on-disk cache
keyed by utterance id:

* ``cache_backend: pickle`` (default) — one .pkl per id
  (utils/data_pipeline.CachedDynamicItem)
* ``cache_backend: hdf5`` — single-container HDF5 cache
  (integrations/hdf5/cached_item.CachedHDF5DynamicItem, needs h5py,
  the reference's choice)

train_speechllm.py reads the cache back with ``use_feats: True``
(hparams/speechllm_ssl_feats.yaml).

Run: python extract_ssl_feats.py hparams/extract_ssl_feats.yaml \
         --data_folder=... --feats_cache_dir=...
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

import speechbrain_tpu as sb
from speechbrain_tpu.dataio.dataio import read_audio
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.utils.data_pipeline import (
    CachedDynamicItem,
    provides,
    takes,
)
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml
from speechbrain_tpu.utils.logger import get_logger

logger = get_logger(__name__)


def build_encode_fn(hparams, params):
    """One jitted wav -> SSL-features program (bf16 by default)."""
    dtype = jnp.bfloat16 if hparams.get("precision", "bf16") == "bf16" else (
        jnp.float32
    )
    extractor = hparams["extractor"]
    latent_proj = hparams["latent_proj"]
    encoder = hparams["encoder"]

    @jax.jit
    def encode(sig):
        lat = extractor.apply(params["extractor"], sig[None])
        lat = lat.astype(dtype)
        lat = latent_proj.apply(params["latent_proj"], lat)
        out = encoder.apply(params["encoder"], lat, train=False)
        out = out[0] if isinstance(out, tuple) else out
        return out[0].astype(jnp.float32)

    return encode


def dataio_prepare(hparams, encode):
    pad_n = int(hparams.get("pad_seconds", 1.0) * hparams["sample_rate"])

    @takes("id", "sig")
    @provides("feats")
    def compute_feats(uid, sig):
        sig = np.asarray(sig, np.float32)
        padded = int(-(-max(len(sig), 1) // pad_n) * pad_n)
        buf = np.zeros((padded,), np.float32)
        buf[: len(sig)] = sig
        feats = np.asarray(encode(jnp.asarray(buf)))
        # drop frames introduced by the bucket padding
        n_valid = max(1, int(feats.shape[0] * len(sig) / padded))
        return feats[:n_valid]

    backend = hparams.get("cache_backend", "pickle")
    if backend == "hdf5":
        from speechbrain_tpu.integrations.hdf5.cached_item import (
            CachedHDF5DynamicItem,
        )

        cached = CachedHDF5DynamicItem.cache(
            hparams["feats_cache_dir"], compression="gzip"
        )(compute_feats)
    else:
        cached = CachedDynamicItem.cache(hparams["feats_cache_dir"])(
            compute_feats
        )

    datasets = {}
    for split, key in (("train", "train_annotation"),
                       ("valid", "valid_annotation")):
        if hparams.get(key) is None or not Path(hparams[key]).exists():
            continue
        ds = DynamicItemDataset.from_json(
            hparams[key], replacements={"data_root": hparams["data_folder"]}
        )
        ds.add_dynamic_item(read_audio, takes="wav", provides="sig")
        ds.add_dynamic_item(cached)
        ds.set_output_keys(["id", "feats"])
        datasets[split] = ds
    return datasets


if __name__ == "__main__":
    hparams_file, run_opts, overrides = sb.parse_arguments(sys.argv[1:])
    with open(hparams_file, encoding="utf-8") as f:
        hparams = load_hyperpyyaml(f, overrides)
    sb.create_experiment_directory(
        experiment_directory=hparams["output_folder"],
        hyperparams_to_save=hparams_file,
        overrides=overrides,
    )
    Path(hparams["save_folder"]).mkdir(parents=True, exist_ok=True)
    if run_opts.get("debug") and not Path(
        hparams["train_annotation"]
    ).exists():
        sys.path.insert(0, str(Path(__file__).parents[2]))
        from librispeech_prepare import prepare_synthetic

        prepare_synthetic(hparams["data_folder"])
    # init SSL encoder params (or restore a pretrained checkpoint via
    # the checkpointer/pretrainer configured in hparams)
    rng = jax.random.PRNGKey(hparams["seed"])
    sig0 = jnp.zeros((1, int(hparams["sample_rate"])), jnp.float32)
    p_ext = hparams["extractor"].init(rng, sig0)
    lat0 = hparams["extractor"].apply(p_ext, sig0)
    p_lp = hparams["latent_proj"].init(rng, lat0)
    lat0 = hparams["latent_proj"].apply(p_lp, lat0)
    p_enc = hparams["encoder"].init(rng, lat0, train=False)
    params = {"extractor": p_ext, "latent_proj": p_lp, "encoder": p_enc}
    if hparams.get("pretrainer") is not None:
        hparams["pretrainer"].collect_files()
        params = hparams["pretrainer"].load_collected(params)
    encode = build_encode_fn(hparams, params)
    datasets = dataio_prepare(hparams, encode)
    max_items = run_opts.get("debug_batches") or None
    for split, ds in datasets.items():
        logger.info("Warming the feats cache for %s...", split)
        if max_items:
            ds = ds.filtered_sorted(select_n=max_items)
        ds.iterate_once(output_keys=["feats"], progressbar=False)
    logger.info("Done: features cached under %s", hparams["feats_cache_dir"])
