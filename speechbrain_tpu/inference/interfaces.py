"""Pretrained model interfaces.

Capability parity with the reference's ``speechbrain/inference/interfaces.py``
(Pretrained :216, from_hparams :123, foreign_class :44,
EncodeDecodePipelineMixin :492): load a hyperparams.yaml (+ params) from a
local dir / URL / HF repo and expose task methods. Functional twist: the
modules are stateless flax modules; parameters live in ``self.params``
(a dict of pytrees) loaded by the Pretrainer; ``self.apply(name, ...)``
runs a module with its params bound.
"""

import importlib.util
import pathlib
import sys
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np

from speechbrain_tpu.utils.fetching import LocalStrategy, fetch
from speechbrain_tpu.utils.logger import get_logger

logger = get_logger(__name__)


def foreign_class(
    source,
    hparams_file="hyperparams.yaml",
    pymodule_file="custom.py",
    classname="CustomInterface",
    overrides={},
    savedir=None,
    **kwargs,
):
    """Fetch and construct a custom interface class shipped with a model
    (reference interfaces.py:44)."""
    savedir = savedir or f"./pretrained_models/{str(source).replace('/', '--')}"
    hparams_local_path = fetch(hparams_file, source, savedir)
    pymodule_local_path = fetch(pymodule_file, source, savedir)
    sys.path.append(str(pymodule_local_path.parent))
    spec = importlib.util.spec_from_file_location("custom", pymodule_local_path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    cls = getattr(module, classname)
    return cls.from_hparams(
        source, hparams_file=hparams_file, savedir=savedir,
        overrides=overrides, **kwargs,
    )


class Pretrained:
    """Base for pretrained interfaces (reference interfaces.py:216).

    Subclasses declare HPARAMS_NEEDED / MODULES_NEEDED and implement task
    methods. Construction from a fetched hyperparams.yaml happens in
    ``from_hparams``.
    """

    HPARAMS_NEEDED = []
    MODULES_NEEDED = []

    def __init__(self, modules=None, hparams=None, params=None,
                 model_state=None, run_opts=None):
        self.mods = SimpleNamespace(**(modules or {}))
        self.hparams = SimpleNamespace(**(hparams or {}))
        for name in self.HPARAMS_NEEDED:
            if not hasattr(self.hparams, name):
                raise ValueError(f"Need hparams['{name}']")
        for name in self.MODULES_NEEDED:
            if not hasattr(self.mods, name):
                raise ValueError(f"Need modules['{name}']")
        self.params = params or {}
        self.model_state = model_state or {}
        self.audio_normalizer = getattr(
            self.hparams, "audio_normalizer", None
        )
        self._jit_cache = {}

    # -- module application ---------------------------------------------------
    def apply(self, name, *args, method=None, **kwargs):
        """Run module ``name`` with bound params/state (eval mode)."""
        module = getattr(self.mods, name)
        variables = {"params": self.params.get(name, {})}
        for coll, trees in self.model_state.items():
            if isinstance(trees, dict) and name in trees and trees[name]:
                variables[coll] = trees[name]
        if method is not None:
            return module.apply(variables, *args, method=method, **kwargs)
        return module.apply(variables, *args, **kwargs)

    # -- audio loading ----------------------------------------------------------
    def load_audio(self, path, savedir=None):
        """Load (and resample/downmix) one audio file to a 1-D array
        (reference interfaces.py:344)."""
        from speechbrain_tpu.dataio.dataio import read_audio, read_audio_info

        signal = read_audio(path)
        _frames, sr, _ch = read_audio_info(path)
        target_sr = getattr(self.hparams, "sample_rate", 16000)
        if sr != target_sr:
            from speechbrain_tpu.augment.time_domain import Resample

            signal = np.asarray(
                Resample(orig_freq=sr, new_freq=target_sr)(
                    jnp.asarray(signal)[None]
                )
            )[0]
        return jnp.asarray(signal)

    # -- loading -----------------------------------------------------------------
    @classmethod
    def from_hparams(
        cls,
        source,
        hparams_file="hyperparams.yaml",
        pymodule_file="custom.py",
        overrides={},
        savedir=None,
        use_auth_token=False,
        revision=None,
        download_only=False,
        overrides_must_match=True,
        **kwargs,
    ):
        """Fetch yaml + params and build the interface
        (reference interfaces.py:123)."""
        from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml

        if savedir is None:
            savedir = f"./pretrained_models/{str(source).replace('/', '--')}"
        hparams_local_path = fetch(hparams_file, source, savedir)
        with open(hparams_local_path, encoding="utf-8") as fin:
            hparams = load_hyperpyyaml(fin, overrides, overrides_must_match)

        pretrainer = hparams.get("pretrainer", None)
        params, model_state = {}, {}
        if pretrainer is not None:
            pretrainer.set_collect_in(savedir)
            pretrainer.collect_files(default_source=source)
            if not download_only:
                pretrainer.load_collected()
            # PytreeRef loadables named params_<module> / state_<module>
            for lname, obj in pretrainer.loadables.items():
                tree = getattr(obj, "tree", None)
                if tree is None:
                    continue
                if lname.startswith("state_"):
                    for coll, sub in tree.items():
                        model_state.setdefault(coll, {})[
                            lname[len("state_"):]
                        ] = sub
                else:
                    name = lname[len("params_"):] if lname.startswith("params_") else lname
                    params[name] = tree
        if download_only:
            return None
        modules = hparams.get("modules", {})
        return cls(
            modules=modules,
            hparams=hparams,
            params=params,
            model_state=model_state,
            **kwargs,
        )


class EncodeDecodePipelineMixin:
    """Pipeline helpers for encode/decode-style custom interfaces
    (reference interfaces.py:492)."""

    def create_pipelines(self):
        from speechbrain_tpu.utils.data_pipeline import DataPipeline

        self.encode_pipeline = DataPipeline(
            static_data_keys=self.INPUT_STATIC_KEYS,
            dynamic_items=self.hparams.encode_pipeline["steps"],
            output_keys=self.hparams.encode_pipeline["output_keys"],
        )
        self.decode_pipeline = DataPipeline(
            static_data_keys=self.hparams.model_output_keys,
            dynamic_items=self.hparams.decode_pipeline["steps"],
            output_keys=self.OUTPUT_KEYS,
        )

    def encode_input(self, input):
        return self.encode_pipeline(input)

    def decode_output(self, output):
        return self.decode_pipeline(output)
