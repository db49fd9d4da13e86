"""Structured run logging: JSON-lines event stream per fit run.

The reference's observability is bare ``print`` statements (SURVEY.md
section 5).  Here every pipeline stage appends machine-readable events to
``{dirname}/run_log.jsonl`` (timestamps, durations, stage metadata,
acceptance fractions, autocorrelation estimates), alongside the prints.
"""
from __future__ import annotations

import json
import os
import time


class RunLog:
    def __init__(self, dirname: str, echo: bool = False):
        os.makedirs(dirname, exist_ok=True)
        self.path = os.path.join(dirname, "run_log.jsonl")
        self.echo = echo
        self._t0 = {}

    def event(self, kind: str, **fields):
        rec = {"t": round(time.time(), 3), "event": kind, **fields}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self.echo:
            print(f"[{kind}] {fields}")

    def start(self, stage: str, **fields):
        self._t0[stage] = time.perf_counter()
        self.event(stage + ".start", **fields)

    def end(self, stage: str, **fields):
        dt = time.perf_counter() - self._t0.pop(stage, time.perf_counter())
        self.event(stage + ".end", wall_s=round(dt, 3), **fields)


def read_run_log(dirname: str):
    path = os.path.join(dirname, "run_log.jsonl")
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]
