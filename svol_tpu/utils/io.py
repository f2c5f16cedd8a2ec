"""Small IO helpers (jsonl/json, timestamps) — misc.py:18-59 equivalents."""
from __future__ import annotations

import json
import time
from typing import Any, Iterable, List


def cur_time() -> str:
    return time.strftime("%Y_%m_%d_%H_%M_%S")


def save_jsonl(rows: Iterable[Any], path: str) -> None:
    with open(path, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")


def load_jsonl(path: str) -> List[Any]:
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def save_json(obj: Any, path: str, save_pretty: bool = False,
              sort_keys: bool = False) -> None:
    with open(path, "w") as f:
        if save_pretty:
            json.dump(obj, f, indent=4, sort_keys=sort_keys)
        else:
            json.dump(obj, f, sort_keys=sort_keys)
