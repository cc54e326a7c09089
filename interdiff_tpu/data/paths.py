"""Dataset-path configuration files — the `data/cfg/BEHAVE.yml` /
`HOI.yml` equivalent (`interdiff/data/dataset_smpl.py:20-23`).

A config is a small YAML mapping; keys mirror the reference's (the README
vs file-name case bug and the `sequences`/`sequence` key drift noted in
SURVEY.md §7 are handled by accepting either spelling):

    MOTION_PATH: /data/behave/sequences
    OBJECT_TEMPLATE: /data/behave/objects
    MODEL_PATH: /data/smplh            # dir with SMPLH_{male,female}.pkl
    SPLIT_PATH: /data/behave/split.json
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Optional


@dataclass(frozen=True)
class DataPaths:
    motion_path: Optional[str] = None
    object_path: Optional[str] = None
    model_path: Optional[str] = None
    split_path: Optional[str] = None


def load_paths(config_file: str | Path) -> DataPaths:
    import yaml

    with open(config_file) as f:
        raw = yaml.safe_load(f) or {}
    lower = {str(k).lower(): v for k, v in raw.items()}

    def get(*names):
        for n in names:
            if lower.get(n):
                return str(lower[n])
        return None

    return DataPaths(
        motion_path=get("motion_path", "sequences", "sequence"),
        object_path=get("object_template", "object_path", "objects"),
        model_path=get("model_path"),
        split_path=get("split_path"),
    )
