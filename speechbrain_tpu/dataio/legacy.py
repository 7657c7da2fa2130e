"""Legacy ExtendedCSV dataset format.

Capability parity with the reference's ``speechbrain/dataio/legacy.py``
(ExtendedCSVDataset :24): CSVs with ``<key>, <key>_format, <key>_opts``
column triplets, audio loaded by format, optional sorting.
"""

import csv
from collections import namedtuple

from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.dataio.dataio import read_audio

CSVItem = namedtuple("CSVItem", ["data", "format", "opts"])


class ExtendedCSVDataset(DynamicItemDataset):
    """Dataset from the legacy extended-CSV format.

    Example CSV header: ID, duration, wav, wav_format, wav_opts, ...
    """

    def __init__(
        self,
        csvpath,
        replacements={},
        sorting="original",
        min_duration=0,
        max_duration=36000,
        dynamic_items=(),
        output_keys=(),
    ):
        if sorting not in ("original", "ascending", "descending", "random"):
            raise ValueError(f"Unknown sorting {sorting}")
        data, di_to_add, data_names = load_sb_extended_csv(csvpath, replacements)
        super().__init__(data, dynamic_items, output_keys)
        for di in di_to_add:
            self.add_dynamic_item(**di)
        reverse = sorting == "descending"
        sort_key = "duration" if sorting in ("ascending", "descending") else None
        if sort_key is not None or min_duration > 0 or max_duration < 36000:
            filtered = self._filtered_sorted_ids(
                key_min_value={"duration": min_duration},
                key_max_value={"duration": max_duration},
                sort_key=sort_key,
                reverse=reverse,
            )
            self.data_ids = filtered
        if not output_keys:
            self.set_output_keys(["id"] + list(data_names))


def load_sb_extended_csv(csv_path, replacements={}):
    """Parse the triplet-column CSV; returns (data, dynamic_items, names)."""
    with open(csv_path, newline="", encoding="utf-8") as f:
        result = {}
        reader = csv.DictReader(f, skipinitialspace=True)
        fields = reader.fieldnames
        if fields[0] != "ID":
            raise KeyError("CSV has to have an 'ID' field, with unique ids for all data points")
        if fields[1] != "duration":
            raise KeyError("CSV has to have a 'duration' field")
        variable_fields = fields[2:]
        if len(variable_fields) % 3 != 0:
            raise ValueError("All named fields must have 3 entries: <name>, <name>_format, <name>_opts")
        names = [variable_fields[i] for i in range(0, len(variable_fields), 3)]
        for row in reader:
            data_id = row.pop("ID")
            duration = float(row.pop("duration"))
            entry = {"duration": duration}
            for name in names:
                data = row[name]
                for key, value in replacements.items():
                    data = data.replace("$" + key, str(value))
                entry[name + "__ecsv"] = CSVItem(
                    data, row[name + "_format"], row[name + "_opts"]
                )
            result[data_id] = entry
        dynamic_items = [
            {
                "func": _read_csv_item,
                "takes": name + "__ecsv",
                "provides": name,
            }
            for name in names
        ]
        return result, dynamic_items, names


def _read_csv_item(item):
    """Load one extended-CSV item by its declared format."""
    fmt = item.format.lower()
    if fmt in ("wav", "flac", "ogg"):
        return read_audio(item.data)
    if fmt == "string":
        return item.data.split(" ")
    if fmt == "pkl":
        import pickle

        with open(item.data, "rb") as f:
            return pickle.load(f)
    raise TypeError(f"Unknown extended-CSV format {item.format}")
