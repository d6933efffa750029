"""Minimal FITS *writer* — test-fixture generator for the ``cosmo-fits``
data source (sources/fits_datasource.py).

Writes the subset of FITS the COS products use (ref:
cosmo/filesystem.py:34-92 reads primary/extension headers + BINTABLE
columns): a primary header HDU plus BINTABLE extensions with scalar
numeric / fixed-width string columns.  Big-endian, 2880-byte blocks,
80-byte cards — enough for astropy (or any reader) to open what we write,
with no astropy dependency in this environment.

The matching reader lives INSIDE ``fits_datasource.build_datasource`` so it
pickles by value into Spark's Python workers (same constraint as the SMS
source); this module stays driver/test-side.
"""

from __future__ import annotations

import numpy as np

BLOCK = 2880
CARD = 80


def _card(key: str, value=None, comment: str = "") -> bytes:
    if value is None:
        text = key.ljust(CARD)
        return text.encode("ascii")
    if isinstance(value, bool):
        v = "T" if value else "F"
        body = f"{key:<8}= {v:>20}"
    elif isinstance(value, (int, np.integer)):
        body = f"{key:<8}= {int(value):>20}"
    elif isinstance(value, (float, np.floating)):
        body = f"{key:<8}= {float(value):>20G}"
    else:
        body = f"{key:<8}= '{value}'"
    if comment:
        body += f" / {comment}"
    return body.ljust(CARD).encode("ascii")[:CARD]


def _pad(b: bytes, fill: bytes = b" ") -> bytes:
    rem = len(b) % BLOCK
    return b if rem == 0 else b + fill * (BLOCK - rem)


def _tform(arr: np.ndarray) -> tuple[str, np.dtype]:
    kind = arr.dtype.kind
    if kind == "f" and arr.dtype.itemsize == 8:
        return "D", np.dtype(">f8")
    if kind == "f":
        return "E", np.dtype(">f4")
    if kind == "i" and arr.dtype.itemsize == 8:
        return "K", np.dtype(">i8")
    if kind == "i" and arr.dtype.itemsize == 2:
        return "I", np.dtype(">i2")
    if kind == "i":
        return "J", np.dtype(">i4")
    if kind in ("S", "U"):
        s = arr.astype("S")
        width = s.dtype.itemsize
        return f"{width}A", np.dtype(f"S{width}")
    raise ValueError(f"unsupported column dtype {arr.dtype}")


def write_fits(path: str, hdus: list[dict]) -> None:
    """Write ``hdus`` = [{"header": {...}}, {"header": {...}, "columns":
    {name: np.ndarray}}, ...].  HDU 0 is the primary header; later HDUs
    with "columns" become BINTABLE extensions."""
    out = b""
    for i, hdu in enumerate(hdus):
        header = dict(hdu.get("header", {}))
        columns = hdu.get("columns")
        cards = []
        if i == 0:
            cards.append(_card("SIMPLE", True, "minimal FITS"))
            cards.append(_card("BITPIX", 8))
            cards.append(_card("NAXIS", 0))
            for k, v in header.items():
                cards.append(_card(k, v))
            cards.append(_card("END"))
            out += _pad(b"".join(cards))
            continue
        if columns is None:
            raise ValueError("extension HDUs need columns")
        names = list(columns)
        arrays = [np.asarray(columns[n]) for n in names]
        nrows = len(arrays[0]) if arrays else 0
        forms, dts = zip(*(_tform(a) for a in arrays)) if arrays else ((), ())
        rowbytes = sum(dt.itemsize for dt in dts)
        cards.append(_card("XTENSION", "BINTABLE", "binary table"))
        cards.append(_card("BITPIX", 8))
        cards.append(_card("NAXIS", 2))
        cards.append(_card("NAXIS1", rowbytes))
        cards.append(_card("NAXIS2", nrows))
        cards.append(_card("PCOUNT", 0))
        cards.append(_card("GCOUNT", 1))
        cards.append(_card("TFIELDS", len(names)))
        for j, (n, f) in enumerate(zip(names, forms), start=1):
            cards.append(_card(f"TTYPE{j}", n))
            cards.append(_card(f"TFORM{j}", f))
        for k, v in header.items():
            cards.append(_card(k, v))
        cards.append(_card("END"))
        out += _pad(b"".join(cards))
        rec = np.zeros(nrows, dtype=[(n, dt) for n, dt in zip(names, dts)])
        for n, a, dt in zip(names, arrays, dts):
            rec[n] = a.astype(dt)
        out += _pad(rec.tobytes(), fill=b"\x00")
    with open(path, "wb") as f:
        f.write(out)
