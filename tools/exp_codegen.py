"""Experiment: PQ-encode codegen variants vs the Janino 64 KB method limit.

Round-5 verdict #1: the fused encode stage (16 subspace distance-array
expressions, 16 cells x 4 terms each) exceeds Janino's 64 KB generated-
method limit, so every cold run pays ~8-11 s of doomed compilation and
then executes interpreted.  This harness times encode variants and greps
its own stderr capture for the compile failure so the fix is measured,
not assumed.

Run:  python tools/exp_codegen.py 2>/tmp/exp_codegen.err
then: grep -c "failed to compile\|Failed to compile" /tmp/exp_codegen.err
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cosmo_spark.functions.vectors import as_double
from cosmo_spark.queries.pq_codebooks import PQ_CODEBOOKS

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def encode_current(df, vec_col, id_col, codebooks):
    from cosmo_spark.operators.pq import pq_encode

    return pq_encode(df, vec_col, id_col, codebooks)


def encode_scalar_cells(df, vec_col, id_col, codebooks):
    """Variant A: no arrays — each (subspace, centroid) distance is its own
    small scalar column; min via least(); argmin via chained CASE WHEN
    (first match == lowest code, same tie rule as array_position)."""
    n_sub = len(codebooks)
    sub_dim = len(codebooks[0][0])
    dim = n_sub * sub_dim
    v = as_double(F.col(vec_col))
    out = df.select(F.col(id_col).alias("__id"), v.alias("__v")).filter(
        F.size("__v") == dim
    )
    out = out.select(
        "*", *[F.element_at("__v", i + 1).alias(f"__x{i}") for i in range(dim)]
    )
    cells = []
    for s in range(n_sub):
        for ci, c in enumerate(codebooks[s]):
            terms = [
                f"(__x{s * sub_dim + d} - {float(c[d])!r}D)"
                f" * (__x{s * sub_dim + d} - {float(c[d])!r}D)"
                for d in range(sub_dim)
            ]
            cells.append(F.expr(" + ".join(terms)).alias(f"__c{s}_{ci}"))
    out = out.select("*", *cells)
    mins = [
        F.least(*[F.col(f"__c{s}_{ci}") for ci in range(len(codebooks[s]))])
        .alias(f"__m{s}")
        for s in range(n_sub)
    ]
    out = out.select("*", *mins)
    code_cols = []
    for s in range(n_sub):
        expr = None
        for ci in range(len(codebooks[s])):
            cond = F.col(f"__c{s}_{ci}") == F.col(f"__m{s}")
            expr = F.when(cond, ci + 1) if expr is None else expr.when(cond, ci + 1)
        code_cols.append(expr.cast("int").alias(f"__k{s}"))
    out = out.select("*", *code_cols)
    codes = F.array(*[F.col(f"__k{s}") for s in range(n_sub)])
    se = None
    for s in range(n_sub):
        t = F.col(f"__m{s}")
        se = t if se is None else se + t
    return out.select(F.col("__id").alias(id_col), codes.alias("codes"), se.alias("se"))


def encode_split_arrays(df, vec_col, id_col, codebooks, group=4):
    """Variant B: keep the array-per-subspace shape but stage the 16 array
    expressions across ceil(16/group) chained selects, each select also
    consuming its arrays into (min, argmin) scalars so CollapseProject
    cannot re-merge the stages (each __d is referenced twice downstream)."""
    n_sub = len(codebooks)
    sub_dim = len(codebooks[0][0])
    dim = n_sub * sub_dim
    v = as_double(F.col(vec_col))
    out = df.select(F.col(id_col).alias("__id"), v.alias("__v")).filter(
        F.size("__v") == dim
    )
    out = out.select(
        "*", *[F.element_at("__v", i + 1).alias(f"__x{i}") for i in range(dim)]
    )

    def dists_expr(s):
        cells = []
        for c in codebooks[s]:
            terms = [
                f"(__x{s * sub_dim + d} - {float(c[d])!r}D)"
                f" * (__x{s * sub_dim + d} - {float(c[d])!r}D)"
                for d in range(sub_dim)
            ]
            cells.append(" + ".join(terms))
        return "array(" + ", ".join(cells) + ")"

    for g0 in range(0, n_sub, group):
        grp = range(g0, min(g0 + group, n_sub))
        out = out.select(
            "*", *[F.expr(dists_expr(s)).alias(f"__d{s}") for s in grp]
        )
        out = out.select(
            "*",
            *[
                F.array_position(F.col(f"__d{s}"), F.array_min(f"__d{s}"))
                .cast("int").alias(f"__k{s}")
                for s in grp
            ],
            *[F.array_min(f"__d{s}").alias(f"__m{s}") for s in grp],
        ).drop(*[f"__d{s}" for s in grp])
    codes = F.array(*[F.col(f"__k{s}") for s in range(n_sub)])
    se = None
    for s in range(n_sub):
        t = F.col(f"__m{s}")
        se = t if se is None else se + t
    return out.select(F.col("__id").alias(id_col), codes.alias("codes"), se.alias("se"))


def encode_dot(df, vec_col, id_col, codebooks):
    """Variant C: scalar cells via the inner-product form
    ||x-c||^2 = ||x_s||^2 - 2 x.c + ||c||^2 — fewest codegen ops per cell
    (sub_dim multiplies + adds + one const)."""
    n_sub = len(codebooks)
    sub_dim = len(codebooks[0][0])
    dim = n_sub * sub_dim
    v = as_double(F.col(vec_col))
    out = df.select(F.col(id_col).alias("__id"), v.alias("__v")).filter(
        F.size("__v") == dim
    )
    out = out.select(
        "*", *[F.element_at("__v", i + 1).alias(f"__x{i}") for i in range(dim)]
    )
    cells = []
    xs2 = []
    for s in range(n_sub):
        xs2.append(
            F.expr(
                " + ".join(
                    f"__x{s * sub_dim + d} * __x{s * sub_dim + d}"
                    for d in range(sub_dim)
                )
            ).alias(f"__n{s}")
        )
        for ci, c in enumerate(codebooks[s]):
            c2 = sum(float(x) * float(x) for x in c)
            dot = " + ".join(
                f"__x{s * sub_dim + d} * {float(c[d])!r}D" for d in range(sub_dim)
            )
            cells.append(
                F.expr(f"{c2!r}D - 2.0D * ({dot})").alias(f"__c{s}_{ci}")
            )
    out = out.select("*", *cells, *xs2)
    mins = [
        F.least(*[F.col(f"__c{s}_{ci}") for ci in range(len(codebooks[s]))])
        .alias(f"__m{s}")
        for s in range(n_sub)
    ]
    out = out.select("*", *mins)
    code_cols = []
    for s in range(n_sub):
        expr = None
        for ci in range(len(codebooks[s])):
            cond = F.col(f"__c{s}_{ci}") == F.col(f"__m{s}")
            expr = F.when(cond, ci + 1) if expr is None else expr.when(cond, ci + 1)
        code_cols.append(expr.cast("int").alias(f"__k{s}"))
    out = out.select("*", *code_cols)
    codes = F.array(*[F.col(f"__k{s}") for s in range(n_sub)])
    se = None
    for s in range(n_sub):
        t = F.col(f"__m{s}") + F.col(f"__n{s}")
        se = t if se is None else se + t
    return out.select(F.col("__id").alias(id_col), codes.alias("codes"), se.alias("se"))


def main():
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("exp-codegen")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    variants = {
        "current": encode_current,
        "scalar_cells": encode_scalar_cells,
        "split_arrays_g4": lambda d, v, i, cb: encode_split_arrays(d, v, i, cb, 4),
        "split_arrays_g2": lambda d, v, i, cb: encode_split_arrays(d, v, i, cb, 2),
        "dot": encode_dot,
    }
    which = sys.argv[1:] or list(variants)
    results = {}
    for name in which:
        fn = variants[name]
        df = fn(emb, "embedding", "vec_id", PQ_CODEBOOKS)
        t0 = time.time()
        row = df.agg(
            F.sum(F.element_at("codes", 1)).alias("s1"),
            F.sum("se").alias("se"),
            F.count("*").alias("n"),
        ).collect()[0]
        dt = time.time() - t0
        results[name] = (dt, row["s1"], round(row["se"], 6), row["n"])
        print(f"{name}: {dt:.2f}s  checksum s1={row['s1']} se={row['se']:.6f} n={row['n']}", flush=True)
        spark.catalog.clearCache()
    print("RESULTS", results)


if __name__ == "__main__":
    main()
