"""Spark 4 Python DataSource for FITS exposure files: ``format("cosmo-fits")``.

The reference ingests COS FITS products with a per-file Python loop: open
each file, pull requested header keywords (with defaults for missing keys)
and BINTABLE columns (renaming on collision to ``{key}_{ext}``), convert
byte strings, one record per file (ref: cosmo/filesystem.py:34-92
``FileData``; dask fan-out :355-397).  Here the same extraction is a
pluggable Spark source:

    spark.dataSource.register(build_datasource())
    df = (spark.read.format("cosmo-fits")
          .option("ddl", "ROOTNAME STRING, EXPTIME DOUBLE, TIME ARRAY<DOUBLE>")
          .option("header_request", '{"0": ["ROOTNAME"], "1": ["EXPTIME"]}')
          .option("header_defaults", '{"EXPTIME": 0.0}')
          .option("table_request", '{"1": ["TIME"]}')
          .load("/path/to/exposures"))

- one input partition per file — task parallelism = file parallelism,
  exactly the reference's dask fan-out, but scheduled by Spark;
- requests are declared per extension index, mirroring the reference's
  ``{ext: [keys]}`` REQUEST dicts (data_models.py:32-58);
- header defaults, ``{key}_{ext}`` collision renames, and bytes→str all
  match FileData semantics (filesystem.py:52-57, :64-72, :85-92).

The FITS codec here is a minimal pure-numpy reader for the subset COS files
use (primary/extension headers + BINTABLE with scalar numeric / fixed-width
string fields, big-endian 2880-byte blocks).  If astropy is available it is
preferred (it covers compressed/variable-length cases); the built-in reader
keeps the source dependency-free — fixtures are written by
``sources/fits_io.write_fits``.

Serialization note: everything is defined INSIDE ``build_datasource`` so
cloudpickle ships it by value — Spark runs Python data sources in separate
workers that do not share the driver's sys.path (same constraint as
sources/sms_datasource.py).
"""

from __future__ import annotations


def build_datasource():
    """Build the (self-contained, pickle-by-value) FitsDataSource class."""
    import glob as _glob
    import json as _json
    import os as _os
    import re as _re

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )

    BLOCK, CARD = 2880, 80

    def _parse_value(raw):
        raw = raw.split(" / ")[0].strip()
        if raw.startswith("'"):
            return raw.strip("'").rstrip()
        if raw == "T":
            return True
        if raw == "F":
            return False
        try:
            return int(raw)
        except ValueError:
            pass
        try:
            return float(raw)
        except ValueError:
            return raw

    def _read_header(buf, pos):
        """Parse 80-byte cards from 2880-byte blocks until END."""
        header = {}
        done = False
        while not done:
            block = buf[pos:pos + BLOCK]
            if len(block) < BLOCK:
                raise ValueError("truncated FITS header")
            pos += BLOCK
            for i in range(0, BLOCK, CARD):
                card = block[i:i + CARD].decode("ascii", "replace")
                key = card[:8].strip()
                if key == "END":
                    done = True
                    break
                if not key or card[8:10] != "= ":
                    continue
                header[key] = _parse_value(card[10:])
        return header, pos

    _TFORM = _re.compile(r"^(\d*)([LABIJKED])$")
    _DTYPES = {"D": ">f8", "E": ">f4", "K": ">i8", "J": ">i4",
               "I": ">i2", "B": "u1", "L": "u1"}

    def _read_hdus(path):
        """Return [(header, columns-or-None), ...] for every HDU."""
        import numpy as np

        with open(path, "rb") as f:
            buf = f.read()
        hdus, pos = [], 0
        while pos < len(buf):
            header, pos = _read_header(buf, pos)
            columns = None
            naxis = int(header.get("NAXIS", 0))
            if naxis:
                sizes = [int(header[f"NAXIS{i}"]) for i in range(1, naxis + 1)]
                nbytes = abs(int(header.get("BITPIX", 8))) // 8
                for s in sizes:
                    nbytes *= s
                nbytes += int(header.get("PCOUNT", 0))
                data = buf[pos:pos + nbytes]
                pos += -(-nbytes // BLOCK) * BLOCK  # ceil to block boundary
                if header.get("XTENSION") == "BINTABLE":
                    names, dts = [], []
                    for j in range(1, int(header["TFIELDS"]) + 1):
                        name = str(header[f"TTYPE{j}"]).strip()
                        m = _TFORM.match(str(header[f"TFORM{j}"]).strip())
                        if not m:
                            raise ValueError(
                                f"unsupported TFORM {header[f'TFORM{j}']!r} in {path}"
                            )
                        rep, code = int(m.group(1) or 1), m.group(2)
                        if code == "A":
                            dt = (f"S{rep}",)  # fixed-width string
                        elif rep == 1:
                            dt = (_DTYPES[code],)
                        else:
                            dt = (_DTYPES[code], (rep,))
                        names.append(name)
                        dts.append((name, *dt))
                    rec = np.frombuffer(
                        data[: int(header["NAXIS1"]) * int(header["NAXIS2"])],
                        dtype=dts, count=int(header["NAXIS2"]),
                    )
                    columns = {n: rec[n] for n in names}
            hdus.append((header, columns))
        return hdus

    def _open_hdus(path):
        """astropy when available (wider format coverage), else the
        built-in reader — both yield [(header, columns)]."""
        try:  # pragma: no cover - astropy absent in this environment
            from astropy.io import fits as _fits

            with _fits.open(path) as hl:
                out = []
                for hdu in hl:
                    cols = None
                    if getattr(hdu, "columns", None) is not None and hdu.data is not None:
                        cols = {c.name: hdu.data[c.name] for c in hdu.columns}
                    out.append((dict(hdu.header), cols))
                return out
        except ImportError:
            return _read_hdus(path)

    def _to_py(v):
        """numpy scalar/array -> python value; bytes -> str
        (ref: filesystem.py:52-57)."""
        import numpy as np

        if isinstance(v, np.ndarray):
            if v.dtype.kind == "S":
                # FITS 'A' fields are space-padded; astropy returns stripped
                # chararrays, so strip here too for identical reader output
                v = np.char.rstrip(v.astype(str))
            return v.tolist()
        if isinstance(v, bytes):
            return v.decode("ascii", "replace").rstrip()
        if isinstance(v, np.generic):
            return v.item()
        return v

    def extract_record(path, header_request, table_request, header_defaults):
        """FileData for one file: header values first (defaults for missing
        keys, filesystem.py:64-72), then table columns with {key}_{ext}
        collision renames (:85-92)."""
        hdus = _open_hdus(path)
        rec = {}
        for ext, keys in header_request.items():
            header = hdus[int(ext)][0]
            for key in keys:
                if key in header_defaults:
                    rec[key] = _to_py(header.get(key, header_defaults[key]))
                else:
                    rec[key] = _to_py(header[key])
        for ext, keys in table_request.items():
            columns = hdus[int(ext)][1]
            if columns is None:
                raise ValueError(f"HDU {ext} of {path} has no table data")
            for key in keys:
                out_key = f"{key}_{ext}" if key in rec else key
                rec[out_key] = _to_py(columns[key])
        return rec

    class FitsFilePartition(InputPartition):
        def __init__(self, path):
            self.path = path

    class FitsReader(DataSourceReader):
        def __init__(self, options, ddl):
            self.path = options.get("path")
            if not self.path:
                raise ValueError("cosmo-fits requires a load(path)")
            self.glob = options.get("glob", "*.fits")
            self.header_request = _json.loads(options.get("header_request", "{}"))
            self.table_request = _json.loads(options.get("table_request", "{}"))
            self.header_defaults = _json.loads(options.get("header_defaults", "{}"))
            # output column order = declared schema order
            self.columns = [f.split()[0] for f in _split_ddl(ddl)]

        def partitions(self):
            if _os.path.isdir(self.path):
                files = sorted(_glob.glob(_os.path.join(self.path, self.glob)))
            else:
                files = sorted(_glob.glob(self.path))
            if not files:
                raise FileNotFoundError(f"no FITS files match {self.path}")
            return [FitsFilePartition(p) for p in files]

        def read(self, partition):
            rec = extract_record(
                partition.path, self.header_request,
                self.table_request, self.header_defaults,
            )
            yield tuple(rec.get(c) for c in self.columns)

    def _split_ddl(ddl):
        """Split a DDL column list on top-level commas (ARRAY<...> safe)."""
        parts, depth, cur = [], 0, []
        for ch in ddl:
            if ch == "<":
                depth += 1
            elif ch == ">":
                depth -= 1
            if ch == "," and depth == 0:
                parts.append("".join(cur).strip())
                cur = []
            else:
                cur.append(ch)
        if cur:
            parts.append("".join(cur).strip())
        return parts

    class FitsStreamReader(SimpleDataSourceStreamReader):
        """Incremental exposure discovery (SURVEY ST1): offset = the set of
        already-emitted file names, checkpointed by the engine — the
        reference's ingest-log diff (cosmo/sms/ingest_sms.py:253-270
        ``is_new``) as exactly-once delivery.  Same contract as the
        cosmo-sms stream reader."""

        def __init__(self, options, ddl):
            self.batch = FitsReader(options, ddl)

        def _files(self):
            try:
                return [p.path for p in self.batch.partitions()]
            except FileNotFoundError:
                return []

        def initialOffset(self):
            return {"seen": []}

        def read(self, start):
            seen = set(start["seen"])
            new = [p for p in self._files() if _os.path.basename(p) not in seen]
            rows = []
            for p in new:
                rows.extend(self.batch.read(FitsFilePartition(p)))
            end = {"seen": sorted(seen | {_os.path.basename(p) for p in new})}
            return iter(rows), end

        def readBetweenOffsets(self, start, end):
            delta = set(end["seen"]) - set(start["seen"])
            by_name = {_os.path.basename(p): p for p in self._files()}
            rows = []
            for name in sorted(delta):
                if name in by_name:
                    rows.extend(self.batch.read(FitsFilePartition(by_name[name])))
            return iter(rows)

    class FitsDataSource(DataSource):
        @classmethod
        def name(cls):
            return "cosmo-fits"

        def schema(self):
            ddl = self.options.get("ddl")
            if not ddl:
                raise ValueError(
                    "cosmo-fits requires .option('ddl', '<col TYPE, ...>') — "
                    "the declared extraction schema, like the reference's "
                    "DataModel requests (data_models.py:32-58)"
                )
            return ddl

        def reader(self, schema):
            return FitsReader(self.options, self.options.get("ddl"))

        def simpleStreamReader(self, schema):
            return FitsStreamReader(self.options, self.options.get("ddl"))

    return FitsDataSource


def register(spark) -> None:
    spark.dataSource.register(build_datasource())
