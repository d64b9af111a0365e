"""Deterministic synthetic web-pages table + text extraction + geocoder.

Schema per BASELINE.json input_hint:
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Everything derives from ``h = xxhash64(doc_index)`` (Spark-compatible,
functions/hashing.py) so the SAME rows can be produced JVM-side or
Python-side — the per-row invariant "byte-identical extracted text per
url" is testable end-to-end (FIXTURES.md §T1, §G5.6).

Iceberg note: the sandbox has no Iceberg runtime jar and no network, so
the engine reads/writes parquet; the resume/lineage semantics Iceberg
would give us are provided by sources/manifest.py instead (documented
fallback per SURVEY.md §7 M6).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.hashing import (splitmix64_next, splitmix64_next_scalar, xxhash64_long)

LANGS = np.array(["en", "fr", "de", "es", "pt", "zh"])

_VOCAB = np.array([
    "the", "of", "and", "to", "in", "is", "for", "with", "on", "that",
    "data", "map", "river", "road", "city", "terrain", "line", "bend",
    "tile", "cell", "page", "crawl", "web", "text", "lang", "model",
    "spark", "query", "join", "index", "scale", "shuffle", "stream",
    "simplify", "skeleton", "polygon", "vertex", "angle", "area",
    "distance", "north", "south", "east", "west", "alpha", "beta",
    "gamma", "delta", "omega", "sigma", "kappa", "lambda", "micro",
    "nano", "pico", "mega", "giga", "tera", "peta", "exa", "zetta",
    "quad", "hexa", "octo",
])

EPOCH_2025 = np.datetime64("2025-01-01T00:00:00")


def _texts_for_hashes(h: np.ndarray) -> np.ndarray:
    """Deterministic token sequences, 50-2000 chars, from h alone.
    Vectorized: the splitmix64 word chain is advanced for ALL rows at
    once; per row we join exactly the words the sequential generator
    would have taken (same chain, same output)."""
    h = np.asarray(h, dtype=np.uint64)
    n = len(h)
    out = np.empty(n, dtype=object)
    vocab = _VOCAB
    nv = np.uint64(len(vocab))
    wlens = np.array([len(w) for w in vocab], dtype=np.int64)
    vl = vocab.tolist()
    # Chunked: a full-batch (n, 668) scratch matrix costs ~160 MB of
    # short-lived pages per worker; at 32 concurrent workers the
    # resulting page-fault storm spends 3x more CPU in the kernel than
    # in userspace (measured).  Small chunks stay in the allocator.
    CHUNK = 512
    for lo in range(0, n, CHUNK):
        hc = h[lo:lo + CHUNK]
        m = len(hc)
        n_chars = (50 + (hc % np.uint64(1951))).astype(np.int64)
        # exact worst-case word count for this chunk (shortest word = 2
        # chars + 1 space; sequential rule stops once total >= target)
        W = int(np.max(n_chars)) // 3 + 2
        idx = np.empty((m, W), dtype=np.int64)
        x = hc.copy()
        for k in range(W):
            x, z = splitmix64_next(x)
            idx[:, k] = (z % nv).astype(np.int64)
        cum = np.cumsum(wlens[idx] + 1, axis=1) - 1  # chars after k+1 words
        # sequential rule: add words while total < target (total starts -1)
        nw = (cum < n_chars[:, None]).sum(axis=1) + 1
        for i in range(m):
            words = [vl[j] for j in idx[i, :nw[i]]]
            out[lo + i] = " ".join(words)[:n_chars[i]]
    return out


def generate_pages_pdf(ids: np.ndarray) -> pd.DataFrame:
    """Generate the pages rows for the given doc indices (vectorized
    except the bounded text loop).

    Convention note: site/warc_ts/lang derive from the UNSIGNED hash
    (``h % m`` on uint64) — these columns have no SQL-oracle
    requirement.  The geocoder (geocode_hashes below) deliberately uses
    SIGNED pmod semantics instead so its formula is reproducible as
    Spark/DuckDB SQL; do not mix the two conventions when adding
    derived columns that need an SQL twin."""
    ids = np.asarray(ids, dtype=np.int64)
    h = xxhash64_long(ids)
    site = (h % np.uint64(10_000)).astype(np.int64)
    url = np.array([f"https://site{s}.example/p/{i}" for s, i in zip(site, ids)],
                   dtype=object)
    warc_ts = EPOCH_2025 + (h % np.uint64(31_536_000)).astype("timedelta64[s]")
    text = _texts_for_hashes(h)
    lang = LANGS[(h % np.uint64(6)).astype(np.int64)]
    html = np.array([
        (f"<html><head><title>site{s}</title></head><body><p>{t}</p></body></html>"
         ).encode("utf-8")
        for s, t in zip(site, text)], dtype=object)
    return pd.DataFrame({
        "url": url,
        "warc_ts": pd.Series(warc_ts),
        "html": html,
        "text": text,
        "lang": lang,
    })


def extract_text_bytes(html: bytes) -> str:
    """P9 — deterministic text extraction, byte-identical per url.
    Pulls the first <p>..</p> payload; falls back to tag stripping."""
    s = html.decode("utf-8", errors="replace")
    start = s.find("<p>")
    if start != -1:
        end = s.find("</p>", start)
        if end != -1:
            return s[start + 3:end]
    out = []
    in_tag = False
    for ch in s:
        if ch == "<":
            in_tag = True
        elif ch == ">":
            in_tag = False
        elif not in_tag:
            out.append(ch)
    return "".join(out)


def extract_text_series(html: pd.Series) -> pd.Series:
    return html.map(extract_text_bytes)


# ---------------------------------------------------------------------------
# P10 — deterministic geocoder (FIXTURES.md §T1 derived columns)
# ---------------------------------------------------------------------------

def geocode_hashes(h: np.ndarray):
    """h -> (lon, lat, has_footprint, side) per FIXTURES.md T1:
    lon=pmod(h,360000)/1000-180, lat=pmod(h>>20,170000)/1000-85; a
    footprint square of side 0.01+pmod(h,100)/1e4 exists where
    pmod(h,7)==0.  Defined on SIGNED h with pmod semantics (arithmetic
    shift) so the identical expression is valid Spark SQL / DuckDB SQL:
        pmod(xxhash64(doc_id), 360000)/1000 - 180  etc.
    """
    h = np.asarray(h, dtype=np.int64)
    lon = np.mod(h, 360_000).astype(np.float64) / 1000.0 - 180.0
    lat = np.mod(h >> 20, 170_000).astype(np.float64) / 1000.0 - 85.0
    has_fp = np.mod(h, 7) == 0
    side = 0.01 + np.mod(h, 100).astype(np.float64) / 1e4
    return lon, lat, has_fp, side


def geocode_columns(h_col):
    """Spark Column twin of :func:`geocode_hashes` — the SAME pmod
    constants emitted as JVM-side expressions, so streaming/batch SQL
    paths can geocode without re-stating the fixture formula (a copy
    in streaming/ingest.py once risked silent divergence; a parity
    test pins this twin to the numpy kernel)."""
    from pyspark.sql import functions as F

    lon = F.pmod(h_col, F.lit(360_000)) / 1000.0 - 180.0
    lat = F.pmod(F.shiftright(h_col, 20), F.lit(170_000)) / 1000.0 - 85.0
    return lon, lat


def footprint_hole(lon: float, lat: float, side: float) -> np.ndarray:
    """Interior ring (hole) of a holed footprint: concentric square of
    side/4, wound opposite to the exterior (clockwise).  Exists where
    pmod(h,21)==0 (a third of the pmod(h,7)==0 footprints)."""
    hh = side / 8.0
    return np.array([
        (lon - hh, lat - hh), (lon - hh, lat + hh),
        (lon + hh, lat + hh), (lon + hh, lat - hh),
        (lon - hh, lat - hh)], dtype=np.float64)


def synthesize_geoms_pdf(urls: np.ndarray, h: np.ndarray) -> pd.DataFrame:
    """Batch geometry synthesis (P10) — zero per-row Python in the hot
    math: points for every page, footprint squares (pmod(h,7)==0, with
    an interior-ring hole when pmod(h,21)==0), and polyline traces
    (pmod(h,3)==0), as multi-ring columnar geometry
    (xs, ys flat-concatenated across rings + ring_offsets starts).

    Mirrors the reference's polygon-as-ring-list data model
    (reduce_bend_algorithm.py:322-335) in the columnar encoding of
    SURVEY.md §1.2."""
    h = np.asarray(h, dtype=np.int64)
    lon, lat, has_fp, side = geocode_hashes(h)
    single = [np.array([0], dtype=np.int32)]

    out_url, out_h, out_kind, out_xs, out_ys, out_off = [], [], [], [], [], []

    # points: one per page
    out_url.append(urls)
    out_h.append(h)
    out_kind.append(np.zeros(len(h), dtype=np.int8))
    out_xs.extend([lon[i:i + 1] for i in range(len(h))])
    out_ys.extend([lat[i:i + 1] for i in range(len(h))])
    out_off.extend(single * len(h))

    # footprints: (n_fp, 9) exterior rings — square corners plus a small
    # outward bump at each edge midpoint (bump height side/20), so the
    # polygon path has REAL simplification work: Sherbend reduces the
    # bumps (adj_area below the default tolerance) and topology-
    # preserving DP removes them, making the driver queries
    # self-evidencing for polygon-ring simplification.  Holed ones
    # (pmod(h,21)==0) get a plain square as the second ring.
    fp = np.flatnonzero(has_fp)
    if len(fp) > 0:
        half = side[fp] / 2.0
        bump = side[fp] / 20.0
        lo_x, hi_x = lon[fp] - half, lon[fp] + half
        lo_y, hi_y = lat[fp] - half, lat[fp] + half
        ex_x = np.column_stack([lo_x, lon[fp], hi_x, hi_x + bump, hi_x,
                                lon[fp], lo_x, lo_x - bump, lo_x])
        ex_y = np.column_stack([lo_y, lo_y - bump, lo_y, lat[fp], hi_y,
                                hi_y + bump, hi_y, lat[fp], lo_y])
        holed = np.mod(h[fp], 21) == 0
        hh = side[fp] / 8.0
        in_x = np.column_stack([lon[fp] - hh, lon[fp] - hh, lon[fp] + hh,
                                lon[fp] + hh, lon[fp] - hh])
        in_y = np.column_stack([lat[fp] - hh, lat[fp] + hh, lat[fp] + hh,
                                lat[fp] - hh, lat[fp] - hh])
        out_url.append(urls[fp])
        out_h.append(h[fp])
        out_kind.append(np.full(len(fp), 2, dtype=np.int8))
        two = np.array([0, 9], dtype=np.int32)
        for k in range(len(fp)):
            if holed[k]:
                out_xs.append(np.concatenate([ex_x[k], in_x[k]]))
                out_ys.append(np.concatenate([ex_y[k], in_y[k]]))
                out_off.append(two)
            else:
                out_xs.append(ex_x[k])
                out_ys.append(ex_y[k])
                out_off.append(single[0])

    # polylines
    tr = np.flatnonzero(np.mod(h, 3) == 0)
    if len(tr) > 0:
        traces = trace_polylines_batch(h[tr], lon[tr], lat[tr])
        out_url.append(urls[tr])
        out_h.append(h[tr])
        out_kind.append(np.ones(len(tr), dtype=np.int8))
        out_xs.extend([t[:, 0] for t in traces])
        out_ys.extend([t[:, 1] for t in traces])
        out_off.extend(single * len(tr))

    return pd.DataFrame({
        "url": pd.Series(np.concatenate(out_url), dtype="object"),
        "h": pd.Series(np.concatenate(out_h), dtype="int64"),
        "kind": pd.Series(np.concatenate(out_kind), dtype="int8"),
        "xs": pd.Series(out_xs, dtype="object"),
        "ys": pd.Series(out_ys, dtype="object"),
        "ring_offsets": pd.Series(out_off, dtype="object"),
    })


def trace_polylines_batch(h: np.ndarray, lon: np.ndarray, lat: np.ndarray,
                          n_min: int = 16, n_max: int = 48) -> list:
    """Vectorized batch variant of trace_polyline: the splitmix chain
    advances for all rows at once; per-row output is bit-identical to
    the scalar generator (cumsum matches the sequential accumulation
    because the start coordinate is the first summand)."""
    h = np.asarray(h, dtype=np.int64).astype(np.uint64)
    m = len(h)
    if m == 0:
        return []
    n = (n_min + (h % np.uint64(n_max - n_min))).astype(np.int64)
    W = int(n.max())
    dx = np.empty((m, W), dtype=np.float64)
    dy = np.empty((m, W), dtype=np.float64)
    x = h.copy()
    for k in range(W):
        x, z = splitmix64_next(x)
        dx[:, k] = ((z & np.uint64(0xFF)).astype(np.float64) - 127.5) / 127.5
        dy[:, k] = (((z >> np.uint64(8)) & np.uint64(0xFF)).astype(np.float64) - 127.5) / 127.5
    step = 0.002
    deltas_x = step * (1.0 + 0.5 * dx)
    deltas_y = step * dy
    cumx = np.cumsum(np.column_stack([np.asarray(lon, dtype=np.float64), deltas_x]), axis=1)[:, 1:]
    cumy = np.cumsum(np.column_stack([np.asarray(lat, dtype=np.float64), deltas_y]), axis=1)[:, 1:]
    return [np.column_stack([cumx[i, :n[i]], cumy[i, :n[i]]]) for i in range(m)]


def trace_polyline(h: int, lon: float, lat: float, n_min: int = 16,
                   n_max: int = 48) -> np.ndarray:
    """Deterministic wiggly polyline ("GPS trace") around the page's
    point — the Sherbend workload of the pipeline.  Bounded vertex
    count; pure integer PRNG; scale ~ the footprint scale."""
    x = int(h) & 0xFFFFFFFFFFFFFFFF
    n = n_min + (x % (n_max - n_min))
    xs = np.empty(n)
    ys = np.empty(n)
    step = 0.002
    cx, cy = lon, lat
    for k in range(n):
        x, z = splitmix64_next_scalar(x)
        dx = ((z & 0xFF) - 127.5) / 127.5
        dy = (((z >> 8) & 0xFF) - 127.5) / 127.5
        cx += step * (1.0 + 0.5 * dx)
        cy += step * dy
        xs[k] = cx
        ys[k] = cy
    return np.column_stack([xs, ys])
