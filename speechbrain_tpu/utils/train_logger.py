"""Training-stat loggers: file, TensorBoard, Weights & Biases.

Capability parity with the reference's ``speechbrain/utils/train_logger.py``
(FileTrainLogger :50, TensorboardLogger :106, WandBLogger :184). The file
logger writes one summary line per epoch; the others are gated on their
optional deps.
"""

from speechbrain_tpu.utils.logger import get_logger

logger = get_logger(__name__)


class TrainLogger:
    """Abstract interface: log_stats(stats_meta, train/valid/test stats)."""

    def log_stats(
        self,
        stats_meta,
        train_stats=None,
        valid_stats=None,
        test_stats=None,
        verbose=False,
    ):
        raise NotImplementedError


class FileTrainLogger(TrainLogger):
    """One line per epoch in a text file, e.g.
    ``epoch: 3, lr: 1.0e-3 - train loss: 2.31 - valid loss: 2.40, WER: 31.2``
    """

    def __init__(self, save_file, precision=2):
        self.save_file = save_file
        self.precision = precision

    def _item_to_string(self, key, value, dataset=None):
        if isinstance(value, float) and 1.0 < value < 100.0:
            value = f"{value:.{self.precision}f}"
        elif isinstance(value, float):
            value = f"{value:.{self.precision}e}"
        if dataset is not None:
            key = f"{dataset} {key}"
        return f"{key}: {value}"

    def _stats_to_string(self, stats, dataset=None):
        return ", ".join(
            self._item_to_string(k, v, dataset) for k, v in stats.items()
        )

    def log_stats(
        self,
        stats_meta,
        train_stats=None,
        valid_stats=None,
        test_stats=None,
        verbose=True,
    ):
        string_summary = self._stats_to_string(stats_meta)
        for dataset, stats in [
            ("train", train_stats),
            ("valid", valid_stats),
            ("test", test_stats),
        ]:
            if stats is not None:
                string_summary += " - " + self._stats_to_string(stats, dataset)
        with open(self.save_file, "a", encoding="utf-8") as fout:
            print(string_summary, file=fout)
        if verbose:
            logger.info(string_summary)


class TensorboardLogger(TrainLogger):
    """Logs to TensorBoard event files (requires the tensorboard package)."""

    def __init__(self, save_dir):
        self.save_dir = save_dir
        try:
            from torch.utils.tensorboard import SummaryWriter
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "TensorboardLogger requires tensorboard to be installed"
            ) from e
        self.writer = SummaryWriter(self.save_dir)
        self.global_step = {"train": {}, "valid": {}, "test": {}, "meta": 0}

    def log_stats(
        self,
        stats_meta,
        train_stats=None,
        valid_stats=None,
        test_stats=None,
        verbose=False,
    ):
        self.global_step["meta"] += 1
        for name, value in stats_meta.items():
            if isinstance(value, (int, float)):
                self.writer.add_scalar(name, value, self.global_step["meta"])
        for dataset, stats in [
            ("train", train_stats),
            ("valid", valid_stats),
            ("test", test_stats),
        ]:
            if stats is None:
                continue
            for stat, value_list in stats.items():
                if not isinstance(value_list, (list, tuple)):
                    value_list = [value_list]
                tag = f"{stat}/{dataset}"
                new_global_step = self.global_step[dataset].get(stat, 0)
                for value in value_list:
                    new_global_step += 1
                    self.writer.add_scalar(tag, value, new_global_step)
                self.global_step[dataset][stat] = new_global_step


class WandBLogger(TrainLogger):
    """Logs to Weights & Biases (requires wandb)."""

    def __init__(self, initializer=None, **kwargs):
        try:
            import wandb

            if initializer is not None:
                self.run = initializer(**kwargs)
            else:
                self.run = wandb.init(**kwargs)
        except ImportError as e:  # pragma: no cover
            raise ImportError("WandBLogger requires wandb to be installed") from e
        self.step = -1

    def log_stats(
        self,
        stats_meta,
        train_stats=None,
        valid_stats=None,
        test_stats=None,
        verbose=False,
    ):
        logs = {}
        for dataset, stats in [
            ("train", train_stats),
            ("valid", valid_stats),
            ("test", test_stats),
        ]:
            if stats is not None:
                logs[dataset] = stats
        step = stats_meta.get("epoch", None)
        if step is not None:
            if step > self.step:
                self.step = step
            self.run.log({**logs, **stats_meta}, step=self.step)
        else:
            self.run.log({**logs, **stats_meta})


class ProgressSampleLogger:
    """Periodically dump media samples (spectrograms, audio) to disk for
    inspection during training (reference train_logger.py:270)."""

    def __init__(self, output_path, formats=None, format_defs=None, batch_sample_size=1):
        self.output_path = output_path
        self.formats = formats or {}
        self.batch_sample_size = batch_sample_size
        self.progress_samples = {}

    def reset(self):
        self.progress_samples = {}

    def remember(self, **kwargs):
        import numpy as np

        for key, value in kwargs.items():
            self.progress_samples[key] = np.asarray(value)

    def save(self, epoch):
        import os

        import numpy as np

        target = os.path.join(self.output_path, str(epoch))
        os.makedirs(target, exist_ok=True)
        for key, data in self.progress_samples.items():
            mode = self.formats.get(key, "npy")
            if mode == "audio":
                from speechbrain_tpu.dataio.dataio import write_audio

                write_audio(os.path.join(target, f"{key}.wav"), data, 16000)
            else:
                np.save(os.path.join(target, f"{key}.npy"), data)
        self.reset()
