"""IO helpers (reference graphgym/utils/io.py:7-59): line-JSON
(de)serialization and directory management."""

from __future__ import annotations

import json
import os
import shutil
from typing import Dict, List


def dict_to_json(d: Dict, fname: str) -> None:
    with open(fname, "a") as f:
        f.write(json.dumps(d) + "\n")


def dict_list_to_json(dict_list: List[Dict], fname: str) -> None:
    with open(fname, "a") as f:
        for d in dict_list:
            f.write(json.dumps(d) + "\n")


def json_to_dict_list(fname: str) -> List[Dict]:
    out = []
    with open(fname) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out


def makedirs(d: str) -> None:
    os.makedirs(d, exist_ok=True)


def makedirs_rm_exist(d: str) -> None:
    if os.path.isdir(d):
        shutil.rmtree(d)
    os.makedirs(d, exist_ok=True)


def string_to_python(s: str):
    import yaml

    return yaml.safe_load(s)
