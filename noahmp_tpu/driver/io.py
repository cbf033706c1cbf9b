"""Offline-run I/O: domain/initialization loading, forcing providers,
output writing, and restart files.

The reference's intended file layout (run/case.nml: geo_em.d01.nc,
init.nc, ldasin/, ldasout/, restart/) is NetCDF; ``driver/netcdf.py``
implements the format natively (classic read/write, NetCDF-4 read via
h5py), so ``.nc`` paths are first-class here.  ``.npz`` payloads are
supported alongside for cheap scratch runs, and a ``.nc`` path with a
sibling ``.npz`` falls back transparently.  Either way a file maps
variable name -> array; forcing files are named
``ldasin/YYYYMMDDHH.nc`` like LDAS convention.
"""

from __future__ import annotations

import datetime
import os
from typing import Dict, Optional

import numpy as np
import jax.numpy as jnp

from ..constants import NSOIL
from ..state import State, Static, Forcing, init_state
from . import netcdf, solar

STATE_FIELDS = State._fields


def _npz_path(path: str) -> str:
    if path.endswith(".nc") and not os.path.exists(path):
        alt = path[:-3] + ".npz"
        if os.path.exists(alt):
            return alt
    return path


def load_arrays(path: str) -> Dict[str, np.ndarray]:
    path = _npz_path(path)
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    if netcdf.sniff(path):
        return netcdf.read_arrays(path)
    raise ValueError(f"unsupported input format for {path!r} "
                     "(expected NetCDF or .npz)")


def save_arrays(path: str, arrays: Dict[str, np.ndarray],
                format: Optional[str] = None):
    """``format``: None -> by extension (.nc classic, .nc4 NetCDF-4,
    else .npz); or 'classic' / 'nc4' explicitly for a .nc path."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if path.endswith(".nc4") or format in ("nc4", "hdf5", "netcdf4"):
        return netcdf.write_hdf5(path, arrays)
    if path.endswith(".nc") or format in ("nc", "classic"):
        return netcdf.write_classic(path, arrays)
    np.savez_compressed(path, **arrays)
    return path


# Valid 1-based index ranges for the per-point type fields (table row
# counts per params/tables.py: 27 veg classes, 19 soil types, 9 soil
# colors, 9 slope classes).  The one-hot selects in numerics/select.py
# silently yield 0 for out-of-range indices — corrupt domain/restart
# inputs must fail loudly here instead (the reference aborts on bad
# table indices, module_noahmp_utils.f90:43-53).
_INDEX_RANGES = {
    "lutyp": (1, 27), "sltyp": (1, 19), "isc": (1, 9),
    "slptyp": (1, 9), "ist": (1, 2), "ice": (-1, 1),
}


def validate_static(static: Static, where: str = "domain") -> Static:
    """Range-check per-point type indices; raise ValueError on any
    out-of-range value (which would silently zero physics downstream)."""
    for name, (lo, hi) in _INDEX_RANGES.items():
        v = np.asarray(getattr(static, name))
        bad = (v < lo) | (v > hi)
        if bad.any():
            idx = np.flatnonzero(np.atleast_1d(bad).ravel())[:5]
            vals = np.atleast_1d(v).ravel()[idx]
            raise ValueError(
                f"{where}: {name} out of range [{lo},{hi}] at points "
                f"{idx.tolist()} (values {vals.tolist()})")
    return static


def load_domain(path: str) -> Static:
    """Static domain file -> Static pytree (batch axis = land points).

    WRF geogrid files (geo_em.d01.nc with XLAT_M/LU_INDEX 2-D fields)
    are ingested via driver/geo.py; flat per-point files map names
    directly."""
    real = _npz_path(path)
    if netcdf.sniff(real):
        ds = netcdf.read(real)
        names = {k.split("/")[-1].upper() for k in ds.variables}
        if "LU_INDEX" in names and ("XLAT_M" in names
                                    or "XLAT" in names):
            from . import geo
            return validate_static(geo.static_from_geo_em(real)[0],
                                   where=path)
    d = load_arrays(path)
    n = len(np.atleast_1d(d["lat"]))

    def get(name, default, dtype=np.float32):
        if name in d:
            return np.broadcast_to(
                np.asarray(d[name], dtype), (n,)
                if np.ndim(d[name]) <= 1 else d[name].shape)
        return np.broadcast_to(np.asarray(default, dtype), (n,))

    zsoil = d.get("zsoil", np.array([-0.1, -0.4, -1.0, -2.0],
                                    np.float32))
    zsoil = np.broadcast_to(np.asarray(zsoil, np.float32),
                            (n, NSOIL))
    return validate_static(Static(
        lat=get("lat", 0.7), lutyp=get("lutyp", 7, np.int32),
        sltyp=get("sltyp", 6, np.int32),
        slptyp=get("slptyp", 1, np.int32),
        isc=get("isc", 4, np.int32), ist=get("ist", 1, np.int32),
        ice=get("ice", 0, np.int32), zsoil=zsoil,
        shdfac=get("shdfac", 0.7), shdmax=get("shdmax", 0.8),
        tbot=get("tbot", 285.0), zlvl=get("zlvl", 10.0)), where=path)


def load_init(path: str, n: int) -> State:
    """Initialization file -> State; missing fields cold-start."""
    d = load_arrays(path)
    st = init_state(n)
    updates = {}
    for name in STATE_FIELDS:
        if name in d:
            ref = getattr(st, name)
            updates[name] = np.broadcast_to(
                np.asarray(d[name], np.asarray(ref).dtype),
                np.asarray(ref).shape)
    # liquid water may not exceed total soil water (soil ice =
    # smc - swc would go negative and corrupt the water budget);
    # supplying only one of the two implies the other at cold start
    if "swc" in updates and "smc" not in updates:
        updates["smc"] = updates["swc"]
    elif "smc" in updates and "swc" not in updates:
        updates["swc"] = updates["smc"]
        # swc=smc forces zero initial soil ice; with sub-freezing soil
        # temperatures the user likely intended frozen soil (SH2O is an
        # independent input in the reference) — warn rather than guess
        stc = np.asarray(updates.get("stc", st.stc))
        from ..constants import TFRZ
        if (stc[..., -NSOIL:] < TFRZ).any():
            import warnings
            warnings.warn(
                f"init {path}: only smc supplied; assuming swc=smc "
                "(zero soil ice) despite sub-freezing initial soil "
                "temperatures. Supply swc explicitly (or compute "
                "supercooled liquid via physics.soiltemp.frh2o) for a "
                "frozen cold start.", stacklevel=2)
    if "swc" in updates and (updates["swc"]
                             > updates["smc"] + 1e-6).any():
        raise ValueError(f"init {path}: swc (liquid) exceeds smc "
                         "(total soil water) — negative soil ice")
    return st._replace(**updates)


def save_restart(path: str, state: State, when: datetime.datetime):
    arrays = {name: np.asarray(getattr(state, name))
              for name in STATE_FIELDS}
    arrays["_timestamp"] = np.asarray(when.isoformat())
    return save_arrays(path, arrays)


def save_restart_shard(path: str, state: State,
                       when: datetime.datetime, shard):
    """Per-host restart shard for multi-process runs WITHOUT orbax:
    this process's rows [lo, hi) only (a global np.asarray cannot
    fetch non-addressable shards).  Same ``.pLO-HI`` suffix scheme as
    the sharded OutputWriter; ``merge_shard_files`` on the restart
    directory reassembles full restart files."""
    lo, hi, npoints = shard
    arrays = {name: _local_block(getattr(state, name), lo, hi)
              for name in STATE_FIELDS}
    arrays["_timestamp"] = np.asarray(when.isoformat())
    arrays["_shard_lo"] = np.asarray(lo, np.int64)
    arrays["_shard_hi"] = np.asarray(hi, np.int64)
    arrays["_npoints"] = np.asarray(npoints, np.int64)
    fmt = os.path.splitext(path)[1].lstrip(".") or "nc"
    return save_arrays(f"{path}.p{lo:09d}-{hi:09d}", arrays,
                       format=fmt)


def load_restart(path: str):
    d = load_arrays(path)
    ts = np.asarray(d.pop("_timestamp")).ravel()[0]
    if isinstance(ts, bytes):
        ts = ts.decode()
    when = datetime.datetime.fromisoformat(str(ts))
    state = State(**{name: np.asarray(d[name])
                     for name in STATE_FIELDS})
    # a corrupt restart poisons every downstream step; fail loudly
    for name in ("tg", "tv", "stc", "smc", "swc", "sneqv", "snowh"):
        v = np.asarray(getattr(state, name))
        if not np.isfinite(v).all():
            raise ValueError(f"restart {path}: non-finite {name}")
    nsnow = np.asarray(state.nsnow)
    if ((nsnow < 0) | (nsnow > 3)).any():
        raise ValueError(f"restart {path}: snow layer count out of "
                         "range [0,3]")
    return state, when


class AsyncSink:
    """Ordered background executor for output-side I/O (window writes,
    restart saves).  Device->host fetches and file writes run on the
    worker thread so they overlap the model's device steps — the main
    loop never blocks on the (slow, possibly relayed) download path.
    Exceptions propagate: the next submit()/close() re-raises."""

    def __init__(self, name="noahmp-io"):
        import queue
        import threading
        self._q = queue.Queue(maxsize=8)
        self._err = None
        self._t = threading.Thread(target=self._run, name=name,
                                   daemon=True)
        self._t.start()

    def _run(self):
        while True:
            job = self._q.get()
            if job is None:
                return
            fn, args, kwargs = job
            try:
                fn(*args, **kwargs)
            except BaseException as e:  # noqa: BLE001
                self._err = e

    def _check(self):
        if self._err is not None:
            err, self._err = self._err, None
            raise err

    def submit(self, fn, *args, **kwargs):
        self._check()
        self._q.put((fn, args, kwargs))

    def close(self):
        self._q.put(None)
        self._t.join()
        self._check()


# ---------------------------------------------------------------------
# Compact (device-interp) chunk forcing.
#
# The exact pipeline uploads a fully-materialized (T, n) stack of all
# 15 Forcing fields per chunk even though the source data is hourly
# and most fields are linear interpolations of two hourly frames: at
# 131k points that is ~7.9 MB per 900 s step, and over the relayed
# single-chip link the upload dominates the production case wall time
# (CASE_r05: dispatch 45 ms RT + ~0.25 s/step upload vs a 12 ms
# compute step).  Compact mode uploads the unique hourly frames once
# plus per-step scalars, and a small jitted expander materializes the
# (T, n) stack ON DEVICE: ~4x less host->device traffic, identical
# downstream contract.  Opt-in (forcing_mode="compact") because the
# device interpolation may differ from the host's by an FMA ulp.
# ---------------------------------------------------------------------

FRAME_FIELDS = ("sfctmp", "sfcprs", "q2", "uu", "vv", "soldn", "lwdn",
                "prcp")
# mirrors FileForcing.INTERP/HOLD (defined below; asserted in tests)
_INTERP_SET = frozenset(FRAME_FIELDS) - {"prcp"}


def compact_chunk(provider: "FileForcing", when, steps, timestep):
    """Host-side compact representation of one chunk's forcing:
    (frames (H, 8, n), i0 (T,), w (T,), cosz (T, n), jd (T,),
    yearlen ()) plus the optional trace-gas constants."""
    from .config import _ANCHOR
    n = provider.static.lat.shape[0]
    secs = provider.infreq.total_seconds()
    hours = []          # unique frame times, in order
    hour_index = {}
    i0 = np.empty(steps, np.int32)
    w = np.empty(steps, np.float32)
    jd = np.empty(steps, np.float32)
    cosz = np.empty((steps, n), np.float32)
    yearlen = None
    for t in range(steps):
        now = when + t * timestep
        since = (now - _ANCHOR).total_seconds()
        t0 = _ANCHOR + datetime.timedelta(seconds=(since // secs) * secs)
        for tt in (t0, t0 + provider.infreq):
            if tt not in hour_index:
                hour_index[tt] = len(hours)
                hours.append(tt)
        i0[t] = hour_index[t0]
        w[t] = (now - t0).total_seconds() / secs
        yearlen = float(solar.year_length(now.year))
        jd64 = solar.julian_day(now)   # full f64, as the provider uses
        jd[t] = jd64                   # Forcing.julian is f32 anyway
        d0 = provider._load(t0)
        lon = np.asarray(d0.get("lon", 0.0), np.float32)
        cosz[t] = np.broadcast_to(np.asarray(solar.cos_zenith(
            np.asarray(provider.static.lat), lon, jd64,
            yearlen), np.float32), (n,))
    # consecutive-frame layout so the expander can index i0 and i0+1
    assert all(hour_index[h] == k for k, h in enumerate(hours))
    frames = np.empty((len(hours), len(FRAME_FIELDS), n), np.float32)
    consts = {}
    for k, h in enumerate(hours):
        d = provider._load(h)
        for j, f in enumerate(FRAME_FIELDS):
            frames[k, j] = np.broadcast_to(
                np.asarray(d[f], np.float32), (n,))
        if k == 0:
            for f, dflt in (("co2air", 39.0), ("o2air", 18900.0),
                            ("foln", 1.0)):
                consts[f] = np.broadcast_to(np.asarray(
                    d.get(f, dflt), np.float32), (n,)).copy()
    return (frames, i0, w, cosz, jd,
            np.float32(yearlen), consts["co2air"], consts["o2air"],
            consts["foln"])


def make_chunk_expander():
    """Jitted device-side expansion of a compact chunk into the
    stacked (T, n) Forcing the chunked driver consumes."""
    import jax

    def expand(frames, i0, w, cosz, jd, yearlen, co2air, o2air, foln):
        a = frames[i0]          # (T, 8, n) — H is tiny, gather is cheap
        b = frames[i0 + 1]
        wt = w[:, None]
        T, n = cosz.shape
        fields = {}
        for j, f in enumerate(FRAME_FIELDS):
            if f in _INTERP_SET:
                fields[f] = (1.0 - wt) * a[:, j] + wt * b[:, j]
            else:                       # hold (prcp), LDAS-style
                fields[f] = a[:, j]
        rep = lambda v: jnp.broadcast_to(v[None, None], (T, n))  # noqa: E731
        return Forcing(
            sfctmp=fields["sfctmp"], sfcprs=fields["sfcprs"],
            psfc=fields["sfcprs"], uu=fields["uu"], vv=fields["vv"],
            q2=fields["q2"], soldn=fields["soldn"],
            lwdn=fields["lwdn"], prcp=fields["prcp"], cosz=cosz,
            co2air=jnp.broadcast_to(co2air[None], (T, n)),
            o2air=jnp.broadcast_to(o2air[None], (T, n)),
            foln=jnp.broadcast_to(foln[None], (T, n)),
            julian=jnp.broadcast_to(jd[:, None], (T, n)),
            yearlen=jnp.broadcast_to(yearlen[None, None], (T, n)))

    return jax.jit(expand)


class ChunkPrefetcher:
    """Builds the next chunks' stacked forcing on a background thread
    and ships them to the device while the current chunk computes.

    ``schedule``: iterable of (when, steps); for each entry the thread
    assembles the (steps, n) stacked Forcing pytree (host-side provider
    calls + np.stack) and ``jax.device_put``s it with ``sharding`` (or
    to the default device).  A bounded queue (depth 2) caps host+device
    memory at two chunks in flight."""

    def __init__(self, provider, schedule, timestep, sharding=None,
                 depth=2, compact=False):
        import queue
        import threading
        import jax
        self._q = queue.Queue(maxsize=depth)
        self._err = None
        if compact and (sharding is not None
                        or not isinstance(provider, FileForcing)):
            # compact mode targets the single-device file-driven case;
            # sharded paths keep the exact per-leaf upload
            compact = False
        expander = make_chunk_expander() if compact else None

        def work():
            try:
                for when, steps in schedule:
                    if compact:
                        parts = compact_chunk(provider, when, steps,
                                              timestep)
                        stacked = expander(*jax.device_put(parts))
                    else:
                        fo = [provider(when + i * timestep)
                              for i in range(steps)]
                        stacked = jax.tree.map(
                            lambda *xs: np.stack(
                                [np.asarray(x) for x in xs]), *fo)
                        if sharding is not None:
                            from ..dist.mesh import put_global
                            stacked = jax.tree.map(
                                lambda a: put_global(a, sharding),
                                stacked)
                        else:
                            stacked = jax.device_put(stacked)
                    self._q.put(stacked)
            except BaseException as e:  # noqa: BLE001
                self._err = e
                self._q.put(None)

        self._t = threading.Thread(target=work, name="noahmp-forcing",
                                   daemon=True)
        self._t.start()

    def get(self):
        out = self._q.get()
        if out is None and self._err is not None:
            raise self._err
        return out


class ForcingProvider:
    """Interface: forcing(when) -> Forcing for a batch of points."""

    def __call__(self, when: datetime.datetime) -> Forcing:
        raise NotImplementedError


class FileForcing(ForcingProvider):
    """Reads ``<indir>/YYYYMMDDHH[MM].npz`` files at ``infreq`` cadence
    and linearly interpolates state-like fields to the model time
    (precip is held constant over the input interval, LDAS-style)."""

    INTERP = ("sfctmp", "sfcprs", "q2", "uu", "vv", "soldn", "lwdn")
    HOLD = ("prcp",)

    def __init__(self, indir: str, infreq: datetime.timedelta,
                 static: Static, prefetch: bool = True,
                 points_slice=None):
        """``points_slice=(lo, hi)``: this process owns global land
        points [lo, hi) — forcing variables are sliced at read time
        (byte-range seeks for classic .nc, h5py dataset slicing for
        NetCDF-4; see netcdf.read_arrays_slice), so CONUS-scale
        multi-host runs read only their shard instead of every host
        loading the whole per-hour file."""
        self.indir = indir
        self.infreq = infreq
        self.static = static
        self.prefetch = prefetch
        self.points_slice = points_slice
        self._cache: Dict[str, Dict[str, np.ndarray]] = {}
        self._inflight = {}  # isoformat -> Thread

    def _fname(self, when: datetime.datetime) -> str:
        stamp = when.strftime("%Y%m%d%H")
        if self.infreq < datetime.timedelta(hours=1):
            stamp += when.strftime("%M")
        for ext in (".npz", ".nc"):
            p = os.path.join(self.indir, stamp + ext)
            if os.path.exists(_npz_path(p)):
                return p
        raise FileNotFoundError(
            f"no forcing file for {when} in {self.indir}")

    def _read(self, path: str) -> Dict[str, np.ndarray]:
        if self.points_slice is None:
            return load_arrays(path)
        lo, hi = self.points_slice
        real = _npz_path(path)
        if netcdf.sniff(real):
            return netcdf.read_arrays_slice(real, lo, hi)
        # npz fallback: per-variable lazy zip reads, sliced after load
        d = load_arrays(real)
        return {k: (np.asarray(v)[lo:hi]
                    if np.ndim(v) >= 1 and np.shape(v)[0] >= hi else v)
                for k, v in d.items()}

    def _load(self, when: datetime.datetime) -> Dict[str, np.ndarray]:
        key = when.isoformat()
        t = self._inflight.pop(key, None)
        if t is not None:
            t.join()
        if key not in self._cache:
            self._evict()
            self._cache[key] = self._read(self._fname(when))
        return self._cache[key]

    def _evict(self):
        try:
            while len(self._cache) > 4:
                self._cache.pop(next(iter(self._cache)), None)
        except (StopIteration, RuntimeError):
            pass  # concurrent mutation by the prefetch thread

    def _prefetch(self, when: datetime.datetime):
        """Read a forcing file on a background thread so the next
        interval boundary doesn't stall the device-bound time loop."""
        key = when.isoformat()
        if key in self._cache or key in self._inflight:
            return

        def work():
            try:
                data = self._read(self._fname(when))
            except FileNotFoundError:
                return  # the run may end before this interval
            self._evict()
            self._cache[key] = data

        import threading
        t = threading.Thread(target=work, daemon=True)
        t.start()
        self._inflight[key] = t

    def __call__(self, when: datetime.datetime) -> Forcing:
        # naive model-calendar flooring (timezone-independent)
        from .config import _ANCHOR
        secs = self.infreq.total_seconds()
        since = (when - _ANCHOR).total_seconds()
        t0 = _ANCHOR + datetime.timedelta(seconds=(since // secs) * secs)
        t1 = t0 + self.infreq
        w = (when - t0).total_seconds() / secs
        d0 = self._load(t0)
        d1 = self._load(t1) if w > 0 else d0
        if self.prefetch:
            self._prefetch(t1 if w == 0 else t1 + self.infreq)

        n = self.static.lat.shape[0]

        def interp(name):
            a = np.broadcast_to(np.asarray(d0[name], np.float32), (n,))
            b = np.broadcast_to(np.asarray(d1[name], np.float32), (n,))
            return np.asarray((1.0 - w) * a + w * b, np.float32)

        # interp/hold return read-only numpy views aliasing _cache
        # entries; cache arrays are never mutated in place (the
        # prefetch thread only inserts whole new entries), so the
        # views stay valid.  Any future in-place writer must copy.
        def hold(name):
            return np.broadcast_to(
                np.asarray(d0[name], np.float32), (n,))

        yearlen = float(solar.year_length(when.year))
        jd = solar.julian_day(when)
        lon = np.asarray(d0.get("lon", 0.0), np.float32)
        cosz = solar.cos_zenith(np.asarray(self.static.lat), lon, jd,
                                yearlen)
        return Forcing(
            sfctmp=interp("sfctmp"), sfcprs=interp("sfcprs"),
            psfc=interp("sfcprs"), uu=interp("uu"), vv=interp("vv"),
            q2=interp("q2"), soldn=interp("soldn"),
            lwdn=interp("lwdn"), prcp=hold("prcp"),
            cosz=np.broadcast_to(np.asarray(cosz, np.float32), (n,)),
            co2air=hold("co2air") if "co2air" in d0
            else np.full((n,), 39.0, np.float32),
            o2air=hold("o2air") if "o2air" in d0
            else np.full((n,), 18900.0, np.float32),
            foln=hold("foln") if "foln" in d0
            else np.full((n,), 1.0, np.float32),
            julian=np.full((n,), jd, np.float32),
            yearlen=np.full((n,), yearlen, np.float32))


class SyntheticForcing(ForcingProvider):
    """Idealized diurnal-cycle forcing (the reference repo ships no
    forcing data; this generates the offline case's meteorology)."""

    def __init__(self, static: Static, tmean=288.0, tamp=8.0,
                 solmax=800.0, prcp=0.0, q2=0.007, wind=3.0,
                 lwdn=330.0, sfcprs=90000.0):
        self.static = static
        self.tmean, self.tamp = tmean, tamp
        self.solmax, self.prcp = solmax, prcp
        self.q2, self.wind, self.lwdn = q2, wind, lwdn
        self.sfcprs = sfcprs

    def __call__(self, when: datetime.datetime) -> Forcing:
        n = self.static.lat.shape[0]
        yearlen = float(solar.year_length(when.year))
        jd = solar.julian_day(when)
        cosz = solar.cos_zenith(np.asarray(self.static.lat), 0.0, jd,
                                yearlen)
        day = np.maximum(cosz, 0.0)
        sfctmp = self.tmean + self.tamp * (day - 0.3)
        soldn = self.solmax * day

        def rep(v):
            return np.broadcast_to(np.asarray(v, np.float32), (n,))

        return Forcing(
            sfctmp=rep(sfctmp), sfcprs=rep(self.sfcprs),
            psfc=rep(self.sfcprs), uu=rep(self.wind), vv=rep(1.0),
            q2=rep(self.q2), soldn=rep(soldn), lwdn=rep(self.lwdn),
            prcp=rep(self.prcp), cosz=rep(cosz), co2air=rep(39.0),
            o2air=rep(18900.0), foln=rep(1.0), julian=rep(jd),
            yearlen=rep(yearlen))


class OutputWriter:
    """Accumulates per-step fluxes and writes time-stamped output files
    at the configured cadence (the reference's ldasout contract)."""

    def __init__(self, outdir: str, outfreq,
                 fields=("fsa", "fsr", "fira", "fsh", "fcev", "fgev",
                         "fctr", "ssoil", "trad", "ecan", "etran",
                         "edir", "runsrf", "runsub", "fsno", "albedo",
                         "gpp", "nee"), fmt: str = "nc",
                 shard: Optional[tuple] = None):
        """``shard=(lo, hi, npoints)``: multi-host mode — this process
        owns global land points [lo, hi) of ``npoints`` and writes
        per-window SHARD files ``<stamp>.<fmt>.pLO-HI`` containing only
        its slice (fetching only addressable data; a global gather
        would deadlock or OOM at CONUS scale).  ``merge_shard_files``
        reassembles the gridded file offline."""
        from .config import as_cadence
        self.outdir = outdir
        self.outfreq = as_cadence(outfreq)
        self.fields = fields
        self.fmt = fmt
        self.shard = shard
        self._acc: Optional[Dict[str, np.ndarray]] = None
        self._count = 0
        self._files = []

    def push(self, when: datetime.datetime, flux, state: State):
        # accumulate on-device (async dispatch): transferring to host
        # here would force a device sync every step
        if self._acc is None:
            self._acc = {f: jnp.zeros_like(getattr(flux, f))
                         for f in self.fields}
            self._count = 0
        for f in self.fields:
            self._acc[f] = self._acc[f] + getattr(flux, f)
        self._count += 1

        if self.outfreq.due(when) and self._count > 0:
            means = {f: (self._acc[f] / self._count).astype(np.float32)
                     for f in self.fields}
            self._write(when, means, state)
            self._acc = None
        return self._files

    SNAPSHOT = ("tg", "tv", "sneqv", "snowh", "zwt", "smc", "swc",
                "stc", "canliq", "canice", "lai")

    def push_window(self, when, means, state: State):
        """Write one output file directly from precomputed window means
        (the chunked driver accumulates on device inside the scan and
        fetches only at the cadence boundary)."""
        return self._write(when, means, state)

    def _write(self, when, means, state: State):
        if self.shard is not None:
            return self._write_shard(when, means, state)
        arrays = {f: np.asarray(v, np.float32)
                  for f, v in means.items()}
        # instantaneous prognostics snapshot
        for name in self.SNAPSHOT:
            arrays[name] = np.asarray(getattr(state, name))
        path = os.path.join(
            self.outdir, when.strftime("%Y%m%d%H%M") + "." + self.fmt)
        self._files.append(save_arrays(path, arrays))
        return self._files

    def _write_shard(self, when, means, state: State):
        lo, hi, npoints = self.shard
        arrays = {f: _local_block(v, lo, hi).astype(np.float32)
                  for f, v in means.items()}
        for name in self.SNAPSHOT:
            arrays[name] = _local_block(getattr(state, name), lo, hi)
        arrays["_shard_lo"] = np.asarray(lo, np.int64)
        arrays["_shard_hi"] = np.asarray(hi, np.int64)
        arrays["_npoints"] = np.asarray(npoints, np.int64)
        path = os.path.join(
            self.outdir, when.strftime("%Y%m%d%H%M") + "." + self.fmt
            + f".p{lo:09d}-{hi:09d}")
        self._files.append(save_arrays(path, arrays, format=self.fmt))
        return self._files


def _local_block(arr, lo, hi):
    """Rows [lo, hi) of a (possibly multi-host-sharded) batch-major
    array, fetched from addressable shards only.  Works for host numpy
    arrays, fully-addressable jax.Arrays, and multi-host global arrays
    whose addressable shards cover [lo, hi) (the 1-D points mesh puts
    each process's rows contiguously)."""
    if isinstance(arr, np.ndarray):
        return np.asarray(arr[lo:hi])
    shards = getattr(arr, "addressable_shards", None)
    if shards is None:
        return np.asarray(arr)[lo:hi]
    if getattr(arr, "is_fully_addressable", True):
        return np.asarray(arr)[lo:hi]
    out = np.empty((hi - lo,) + tuple(arr.shape[1:]), arr.dtype)
    filled = 0
    for sh in shards:
        idx = sh.index[0] if sh.index else slice(None)
        s0 = idx.start or 0
        s1 = idx.stop if idx.stop is not None else arr.shape[0]
        a, b = max(s0, lo), min(s1, hi)
        if a < b:
            out[a - lo:b - lo] = np.asarray(sh.data)[a - s0:b - s0]
            filled += b - a
    if filled != hi - lo:
        raise ValueError(
            f"addressable shards cover only {filled} of rows "
            f"[{lo},{hi}) — shard bounds must match the process's "
            f"mesh slice")
    return out


def merge_shard_files(outdir: str, delete_shards: bool = False):
    """Reassemble sharded ldasout windows (``<stamp>.nc.pLO-HI`` files
    from per-host OutputWriters) into gridded ``<stamp>.nc`` files.
    Deterministic (shards sorted by lo; classic-NetCDF writer is
    byte-stable), so re-merging reproduces identical bytes.  Returns
    the list of merged file paths."""
    import re
    from collections import defaultdict
    groups = defaultdict(list)
    pat = re.compile(r"^(?P<stem>.+)\.p(?P<lo>\d{9})-(?P<hi>\d{9})$")
    for name in sorted(os.listdir(outdir)):
        m = pat.match(name)
        if m:
            groups[m.group("stem")].append(
                (int(m.group("lo")), int(m.group("hi")),
                 os.path.join(outdir, name)))
    merged = []
    for stem, parts in sorted(groups.items()):
        parts.sort()
        full: Dict[str, np.ndarray] = {}
        npoints = None
        covered = 0
        for lo, hi, path in parts:
            d = load_arrays(path)
            npoints = int(np.asarray(d.pop("_npoints")))
            d.pop("_shard_lo"), d.pop("_shard_hi")
            for k, v in d.items():
                if k not in full:
                    full[k] = np.zeros((npoints,) + np.shape(v)[1:],
                                       np.asarray(v).dtype)
                full[k][lo:hi] = v
            covered += hi - lo
        if npoints is None or covered != npoints:
            raise ValueError(
                f"{stem}: shards cover {covered} of {npoints} points")
        merged.append(save_arrays(os.path.join(outdir, stem), full))
        if delete_shards:
            for _lo, _hi, path in parts:
                os.remove(path)
    return merged
