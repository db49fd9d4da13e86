"""Fit configuration: the reference's key-value parameter file, typed.

Parses the exact format accepted by the reference CLI (``mft6.py:3458-3466``
with schema exemplified by ``param_koi2298.txt``): whitespace-delimited
``key value`` lines, ``#`` comments, bracketed comma arrays with no spaces,
filter-name arrays quoted with single quotes, booleans matched as
``'t' in val.lower()`` (``mft6.py:3480-3483,3517-3520``).
"""
from __future__ import annotations

import dataclasses
import math
from typing import List, Optional

import numpy as np


def _parse_bool(val: str) -> bool:
    return "t" in str(val).lower()


def _parse_float_array(val: str) -> List[float]:
    out = []
    for p in val.strip("[]\n").split(","):
        p = p.strip()
        if p in ("np.nan", "nan"):
            out.append(math.nan)
        elif p:
            out.append(float(p))
    return out


def _parse_str_array(val: str) -> List[str]:
    # reference splits on single quotes and keeps non-comma tokens (mft6.py:3525-3526)
    parts = [p.strip("\\") for p in val.strip("[] \n").split("'")]
    return [p for p in parts if len(p) >= 1 and p != ","]


def parse_param_file(path: str) -> dict:
    """Parse a reference-format parameter file into a raw string dict."""
    pardict = {}
    with open(path) as fi:
        for line in fi:
            # tabs count as separators (the reference splits on ' ' then
            # strips a trailing tab from the value, mft6.py:3458-3466; this
            # is a tolerant superset — array values still must contain no
            # spaces, per the reference's documented format)
            line = line.replace("\t", " ").strip()
            if line.startswith("#") or line == "":
                continue
            fields = line.split(" ")
            # first non-empty token after the key: runs of spaces (e.g.
            # hand-aligned 'nsteps  5000') must not silently drop the line
            val = next((f for f in fields[1:] if f != ""), "")
            if val == "" or val.startswith("#"):
                continue
            pardict[str(fields[0])] = val.strip()
    return pardict


@dataclasses.dataclass
class FitConfig:
    """Typed fit configuration (all keys of ``param_koi2298.txt``)."""

    # setup
    models: str = "btsettl"
    dirname: str = "results"
    fname: str = "fit"
    res: int = 1700
    tmin: int = 3000
    tmax: int = 5500
    lgmin: float = 4.0
    lgmax: float = 5.0
    specmin: int = 3000
    specmax: int = 30000
    mask: bool = True
    rad_prior: bool = False
    # data
    filename: str = ""
    spmin: float = 0.645
    spmax: float = 0.84
    # photometry
    cmag: List[float] = dataclasses.field(default_factory=list)
    cerr: List[float] = dataclasses.field(default_factory=list)
    cfilt: List[str] = dataclasses.field(default_factory=list)
    pmag: List[float] = dataclasses.field(default_factory=list)
    perr: List[float] = dataclasses.field(default_factory=list)
    pfilt: List[str] = dataclasses.field(default_factory=list)
    # system
    plx: float = 0.0
    plx_err: float = 0.0
    dist_fit: bool = True
    av: float = 0.0
    av_err: float = 0.0
    ra: float = 0.0
    dec: float = 0.0
    # fit
    nwalk: int = 150
    nstep: int = 400
    nspec: int = 2
    ndust: int = 0
    nburn: int = 301
    nsteps: int = 15001
    real_values: List[float] = dataclasses.field(default_factory=list)
    # rebuild-only extensions (absent keys keep reference-compatible defaults)
    spectrum_weight: float = 1.0  # 0.0 reproduces mft6_nospec.py behaviour
    grid_dir: Optional[str] = None  # model-spectrum directory override
    bps_dir: Optional[str] = None  # filter-curve directory override
    av_profile: Optional[str] = None  # Av(d) line-of-sight table (d_pc mu sig)
    data_dir: Optional[str] = None  # base dir for relative data paths
    seed: int = 0
    synth: bool = False  # synthetic-input mode (skips KIC->SDSS recalibration)

    @classmethod
    def from_file(cls, path: str) -> "FitConfig":
        raw = parse_param_file(path)
        cfg = cls.from_dict(raw)
        # reference: the 'synth' branch keys off the param *filename* (mft6.py:3553)
        import os

        if "synth" in os.path.basename(str(path)):
            cfg.synth = True
        return cfg

    @classmethod
    def from_dict(cls, raw: dict) -> "FitConfig":
        kw = {}
        fields = {f.name: f for f in dataclasses.fields(cls)}
        for key, val in raw.items():
            if key not in fields:
                continue
            ftype = fields[key].type
            if key in ("cmag", "cerr", "pmag", "perr", "real_values"):
                kw[key] = _parse_float_array(val)
            elif key in ("cfilt", "pfilt"):
                kw[key] = _parse_str_array(val)
            elif ftype in ("bool", bool) or key in ("mask", "rad_prior", "dist_fit", "synth"):
                kw[key] = _parse_bool(val)
            elif key in ("res", "tmin", "tmax", "specmin", "specmax", "nwalk", "nstep",
                         "nspec", "ndust", "nburn", "nsteps", "seed"):
                # the reference reads these via float() (e.g. tma/tmi,
                # mft6.py:3472-3475), so "5600.0" must parse
                kw[key] = int(float(val))
            elif key in ("models", "dirname", "fname", "filename", "grid_dir", "bps_dir",
                         "data_dir", "av_profile"):
                kw[key] = str(val)
            else:
                kw[key] = float(val)
        return cls(**kw)

    @property
    def ndim(self) -> int:
        """Parameter-vector length: 6 for binaries, 8 for triples (mft6.py:1145,1153)."""
        return 2 * self.nspec + 2

    def real_values_or_zero(self) -> np.ndarray:
        if self.real_values and not all(v == 0 for v in self.real_values):
            return np.asarray(self.real_values, dtype=np.float64)
        return np.zeros(self.ndim)
