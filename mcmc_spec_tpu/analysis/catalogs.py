"""Loaders for the reference's population-analysis catalog files.

``planet_error_analysis.py`` reads five hardcoded catalogs (ref :26-124):

* ``targets/targets_kep/all_kois.csv``     — cumulative KOI table (NEA export)
* ``Rgap/exoarchive_kepler_stellar_params.tsv`` — Kepler stellar parameters
* ``Rgap/furlan2017_prcf.tsv``             — Furlan+2017 radius-correction factors
* ``targets/targets_kep/furlan_sample.tsv``— Furlan sample separations
* ``cks_rgap.tsv``                         — CKS radius-gap comparison sample

This module parses those exact formats and reproduces the reference's join
logic into the two tidy frames `analysis.population_analysis` consumes
(``star_catalog`` / ``planet_catalog`` schemas documented in
``analysis/__main__.py``).  A reference user can point the CLI at their
existing catalog files unchanged.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = [
    "load_all_kois",
    "load_kepler_stellar_params",
    "load_furlan_prcf",
    "load_furlan_sample",
    "load_cks_rgap",
    "build_catalogs",
]

# the reference hand-patches four separations after the Furlan join
# (planet_error_analysis.py:119-122)
_SEPARATION_FIXES = {"5971": 0.043, "7099": 0.084, "7716": 0.086, "8077": 0.070}


def _read_table(path) -> pd.DataFrame:
    """astropy ``ascii.read``-ish sniffing: delimiter inferred, ``#`` comments."""
    return pd.read_csv(path, sep=None, engine="python", comment="#",
                       skipinitialspace=True)


def load_all_kois(path) -> pd.DataFrame:
    """The cumulative KOI planet table (``all_kois.csv``, ref :26).

    Expected columns (NEA cumulative export): ``KIC ID``, ``KOI``,
    ``Radius (R_Earth)``, ``Radius error``, ``Eq Temp (K)``, ``Period (days)``,
    ``Period error``, ``Insolation (Earth flux)``, ``Insolation error``,
    ``Planet Radius/Stellar Radius``, ``Planet Rad/Stellar Rad error``.
    """
    t = _read_table(path)
    # period + error converted days -> years up front (ref :46-47)
    out = pd.DataFrame({
        "kic": t["KIC ID"].astype(str),
        "pname": t["KOI"].astype(str),
        "radius": pd.to_numeric(t["Radius (R_Earth)"], errors="coerce"),
        "radius_err": pd.to_numeric(t["Radius error"], errors="coerce"),
        "teq": pd.to_numeric(t["Eq Temp (K)"], errors="coerce"),
        "period": pd.to_numeric(t["Period (days)"], errors="coerce") / 365.25,
        "period_err": pd.to_numeric(t["Period error"], errors="coerce") / 365.25,
        "s": pd.to_numeric(t["Insolation (Earth flux)"], errors="coerce"),
        "s_err": pd.to_numeric(t["Insolation error"], errors="coerce"),
        "rp_rstar": pd.to_numeric(t["Planet Radius/Stellar Radius"], errors="coerce"),
        "rp_rstar_err": pd.to_numeric(t["Planet Rad/Stellar Rad error"],
                                      errors="coerce"),
    })
    return out


def load_kepler_stellar_params(path) -> pd.DataFrame:
    """Exoplanet-archive Kepler stellar table (ref :58-76).

    Expected columns: ``kepid``, ``teff``, ``teff_err1``, ``teff_err2``,
    ``radius``, ``radius_err1``, ``radius_err2``, ``mass``, ``dist``.
    """
    t = _read_table(path)
    # symmetric error = np.max([err2, err1]) on the SIGNED values
    # (planet_error_analysis.py:105-106): archive exports carry err2 <= 0,
    # so this always selects err1 (the upper error) — matched exactly, NOT
    # max(|err1|, |err2|)
    return pd.DataFrame({
        "kepid": t["kepid"].astype(np.int64),
        "kep_teff": pd.to_numeric(t["teff"], errors="coerce"),
        "kep_teff_err": np.maximum(
            pd.to_numeric(t["teff_err1"], errors="coerce"),
            pd.to_numeric(t["teff_err2"], errors="coerce")),
        "kep_rstar": pd.to_numeric(t["radius"], errors="coerce"),
        "kep_rstar_err": np.maximum(
            pd.to_numeric(t["radius_err1"], errors="coerce"),
            pd.to_numeric(t["radius_err2"], errors="coerce")),
        "kep_mstar": pd.to_numeric(t["mass"], errors="coerce"),
        "distance": pd.to_numeric(t["dist"], errors="coerce"),
    })


def load_furlan_prcf(path) -> pd.DataFrame:
    """Furlan+2017 planet-radius correction factors (ref :68-88).

    Expected columns: ``KOI``, ``Orbit`` (``primary``/``companion``, possibly
    space-padded as in the machine-readable table), ``Avg``.
    """
    t = _read_table(path)
    return pd.DataFrame({
        "koi": t["KOI"].astype(str).str.strip(),
        "orbit": t["Orbit"].astype(str).str.strip(),
        "avg": pd.to_numeric(t["Avg"], errors="coerce"),
    })


def load_furlan_sample(path) -> pd.DataFrame:
    """Furlan sample with companion separations (``KOI``, ``Sep``; ref :90-99)."""
    t = _read_table(path)
    return pd.DataFrame({
        "koi": t["KOI"].astype(str).str.strip(),
        "sep": pd.to_numeric(t["Sep"], errors="coerce"),
    })


def load_cks_rgap(path, skip_dtype_rows: int = 3) -> pd.DataFrame:
    """CKS radius-gap sample (ref :124-125): drop the 3 header/dtype rows the
    machine-readable table carries, keep ``Samp == 1`` rows; needs ``Rp`` and
    (for the KDE diagrams) ``Per`` columns."""
    t = _read_table(path)
    if skip_dtype_rows:
        t = t.iloc[skip_dtype_rows:]
    samp = t["Samp"].astype(str).str.strip()
    t = t[samp == "1"]
    out = pd.DataFrame({"Rp": pd.to_numeric(t["Rp"], errors="coerce")})
    if "Per" in t.columns:
        out["Per"] = pd.to_numeric(t["Per"], errors="coerce")
    return out.dropna(subset=["Rp"]).reset_index(drop=True)


def _short(koi: str) -> str:
    """'0268' -> '268': strip exactly ONE leading zero, as the reference's
    ``targets_short`` loop does (planet_error_analysis.py:70-74
    ``t[1:] if t[0] == '0' else t``).  For ids with two or more leading
    zeros ('0042' -> '042') the reference therefore misses Furlan rows keyed
    without padding — matched verbatim so joins hit/miss the same rows."""
    return koi[1:] if koi[:1] == "0" else koi


def build_catalogs(targets, all_kois, stellar_params, furlan_prcf=None,
                   furlan_sample=None):
    """Reproduce the reference's join logic (ref :28-122).

    ``targets``: zero-padded KOI system numbers (e.g. ``["2298", "0268"]``)
    — the reference derives them from ``koi*`` result directory names.
    Returns ``(star_catalog, planet_catalog)`` frames for
    :func:`mcmc_spec_tpu.analysis.planets.population_analysis`.
    """
    targets = [str(t) for t in targets]
    t_ints = {int(float(t)) for t in targets}

    # planets belonging to the targets: KOI 'nnnn.pp' matches system int
    kois = all_kois.copy()
    kois["_sys"] = kois["pname"].astype(float).astype(int)
    planet = kois[kois["_sys"].isin(t_ints)].copy()
    planet["system"] = [str(s).zfill(4) for s in planet["_sys"]]
    planet = planet.drop(columns=["_sys"])

    # one stellar row per distinct KIC, in target order (ref :54-66)
    rows = []
    for t in targets:
        sys_planets = planet[planet["system"] == t.zfill(4)]
        if len(sys_planets) == 0:
            continue
        kic = int(float(sys_planets["kic"].iloc[0]))
        match = stellar_params[stellar_params["kepid"] == kic]
        row = {"system": t.split(".")[0]}
        if len(match):
            row.update(match.iloc[0].drop("kepid").to_dict())
        rows.append(row)
    star = pd.DataFrame(rows)

    if furlan_prcf is not None and len(star):
        pri = furlan_prcf[furlan_prcf["orbit"] == "primary"]
        sec = furlan_prcf[furlan_prcf["orbit"] == "companion"]
        star["kep_pri_prcf"] = [
            float(pri[pri["koi"] == _short(s)]["avg"].iloc[0])
            if _short(s) in set(pri["koi"]) else np.nan
            for s in star["system"]
        ]
        star["kep_sec_prcf"] = [
            float(sec[sec["koi"] == _short(s)]["avg"].iloc[0])
            if _short(s) in set(sec["koi"]) else np.nan
            for s in star["system"]
        ]
    if furlan_sample is not None and len(star):
        star["separation"] = [
            float(furlan_sample[furlan_sample["koi"] == _short(s)]["sep"].iloc[0])
            if _short(s) in set(furlan_sample["koi"]) else np.nan
            for s in star["system"]
        ]
        for sysno, sep in _SEPARATION_FIXES.items():
            star.loc[star["system"].str.lstrip("0") == sysno, "separation"] = sep

    return star.reset_index(drop=True), planet.reset_index(drop=True)
