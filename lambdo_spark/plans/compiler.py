"""JSON workflow spec → topo-sorted DataFrame stages.

The successor of lambdo's Workflow/Table/Column/Topology machinery
(/root/reference/lambdo/Workflow.py:27-46, Table.py:17-22,
Column.py:17-24, Topology.py:18-30), re-imagined:

- a *table definition* compiles to one DataFrame (lazy, immutable) —
  population ops T1–T7 from ``operators.table_ops``;
- *column definitions* compile to withColumn/join stages — C1–C6 from
  ``operators.column_ops``;
- ``extensions`` desugar compiler-side into N concrete columns
  (reference utils.py:13-36, expansion Table.py:48-63);
- dependency stratification is the same Kahn-style layering as
  lambdo's Topology.translate (Topology.py:69-99) but at *table*
  granularity: intra-table ordering is the listed column order, and
  everything inside a stage is delegated to Catalyst.
- filters: the reference forces filter-last (Topology.py:83-85); we
  apply them last in the logical plan and let Catalyst push them down
  (identical semantics — predicates are plain boolean columns).

Spec format (one dict)::

    {"tables": [
      {"id": T, "operation": "source|data|extend|project|product|join|
                              aggregate|map|sql",
       ...population args...,
       "order_by": [cols], "partition_by": [cols],   # window defaults
       "columns": [ {"id": C, "operation": "calculate|roll|shift|all|
                     link|compose|aggregate", ...}, ... ],
       "row_filter": {...}, "column_filter": [...] | {"exclude": [...]}
      }, ...]}
"""

from __future__ import annotations

import copy
import json
import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from lambdo_spark.operators import column_ops as C
from lambdo_spark.operators import table_ops as T


def resolve_callable(ref: str):
    """Reference-style ``module.path:attr`` resolution
    (/root/reference/lambdo/resolve.py:14-49: import module, walk the
    attribute chain). Used for T3 map tables, where a workflow names a
    user batch-kernel (Iterator[pd.DataFrame] -> Iterator[pd.DataFrame])."""
    import importlib

    mod_name, _, attr_path = ref.partition(":")
    if not attr_path:
        raise ValueError(f"callable ref {ref!r} must be 'module:attr'")
    obj = importlib.import_module(mod_name)
    for part in attr_path.split("."):
        obj = getattr(obj, part)
    if not callable(obj):
        raise ValueError(f"{ref!r} resolved to non-callable {obj!r}")
    return obj


def import_modules(imports: list[str], spark: SparkSession | None = None) -> list:
    """Workflow-level ``imports`` (reference Workflow.py:40-41 /
    resolve.py:98-130): each entry is a module name, a dotted path
    mapping to a source file, or an explicit ``*.py`` path; loaded
    modules are registered in ``sys.modules`` so ``module:attr``
    kernel refs resolve against them.

    File-based imports are also shipped to EXECUTORS via
    ``addPyFile`` (the ``spark-submit --py-files`` equivalent) —
    cloudpickle serializes module-level functions by reference, so a
    pandas-UDF kernel from a user file would otherwise throw
    ModuleNotFoundError the moment a worker deserializes it."""
    import importlib
    import importlib.util
    import os as _os
    import sys

    def _by_value(mod):
        # ship kernels from workflow-imported modules BY VALUE inside
        # the task pickle: executors then never need the module on
        # their own import path (addPyFile stays as belt-and-braces
        # for file imports, but name imports from arbitrary sys.path
        # locations — e.g. the reference's examples.example3 — would
        # otherwise ModuleNotFoundError in the python worker)
        try:
            from pyspark import cloudpickle

            cloudpickle.register_pickle_by_value(mod)
        except Exception:
            pass
        return mod

    mods = []
    for name in imports or []:
        if not name.endswith(".py"):
            try:
                mods.append(_by_value(importlib.import_module(name)))
                continue
            except ImportError:
                pass
        path = name if name.endswith(".py") else name.replace(".", "/") + ".py"
        base = _os.path.basename(path)[:-3]
        spec = importlib.util.spec_from_file_location(base, path)
        if spec is None or spec.loader is None:
            raise ImportError(f"workflow import {name!r}: no module and no file {path!r}")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        sys.modules[base] = mod
        if spark is not None:
            spark.sparkContext.addPyFile(path)
        mods.append(_by_value(mod))
    return mods


_STRFTIME_TO_SPARK = [
    ("%Y", "yyyy"), ("%y", "yy"), ("%m", "MM"), ("%d", "dd"),
    ("%H", "HH"), ("%M", "mm"), ("%S", "ss"), ("%f", "SSSSSS"),
    ("%j", "DDD"),
]


def strftime_to_spark(fmt: str) -> str:
    """Python strftime directives -> JVM DateTimeFormatter pattern
    (the subset the reference examples use)."""
    for py, jvm in _STRFTIME_TO_SPARK:
        fmt = fmt.replace(py, jvm)
    return fmt


# Reference workflows name stock pandas/builtins callables
# (examples/example2.json:16, tests/test_calculate.py:23-26). These
# have native JVM kernels here — rewrite in place so reference specs
# stay on the fast path instead of a driver-shipped pandas UDF.
_WELLKNOWN_FUNCTIONS = {
    "pandas:to_datetime": "to_timestamp",
    "pandas.core.tools.datetimes:to_datetime": "to_timestamp",
    "builtins:float": "float",
    "builtins:int": "int",
    "builtins:str": "str",
    "numpy:mean": "mean",
    "numpy.core.fromnumeric:mean": "mean",
    "numpy:sum": "sum",
    "numpy.core.fromnumeric:sum": "sum",
    "numpy:amin": "min",
    "numpy:amax": "max",
    "numpy.core.fromnumeric:amin": "min",
    "numpy.core.fromnumeric:amax": "max",
    "numpy:size": "size",
    "lambdo.std:mean_weighted": "mean_weighted",
}


def _rewrite_wellknown_function(c: dict) -> None:
    ref = c.get("kernel") or c.get("function")
    if ref in ("pandas.core.series:Series.shift", "pandas:Series.shift"):
        # whole-column shift (reference tests/test_calculate.py:54-89)
        # is a dedicated operation here, not a kernel
        c["operation"] = "shift"
        c["periods"] = int((c.get("model") or {}).get("periods", 1))
        c.pop("function", None)
        return
    name = _WELLKNOWN_FUNCTIONS.get(ref)
    if name is None:
        return
    if name == "to_timestamp":
        m = c.get("model") or {}
        # errors='coerce' maps to try_to_timestamp (NULL on parse
        # failure); the default (errors='raise') maps to ANSI
        # to_timestamp, which raises — both pandas-exact. Any other
        # model arg would be SILENTLY dropped by this rewrite, so
        # refuse it loudly.
        extra = set(m) - {"format"} - (
            {"errors"} if m.get("errors") == "coerce" else set()
        )
        if extra:
            raise ValueError(
                f"column {c.get('id')!r}: pandas:to_datetime model args "
                f"{sorted(extra)} are not supported by the Spark "
                "to_timestamp rewrite (supported: format, "
                "errors='coerce' — unparseable values become NULL)"
            )
        c["kernel"] = name
        c.pop("function", None)
        model = {}
        if "format" in m:
            model["fmt"] = strftime_to_spark(m["format"])
        if m.get("errors") == "coerce":
            model["coerce"] = True
        c["model"] = model or None
        return
    c["kernel"] = name
    c.pop("function", None)


def strip_comments(text: str) -> str:
    """`//` line comments, as the reference CLI accepts
    (/root/reference/lambdo/main.py:23)."""
    return re.sub(r"^\s*//.*$", "", text, flags=re.MULTILINE)


def expand_extensions(col_def: dict) -> list[dict]:
    """C8 — column families (reference utils.py:13-36): base ⊗ each
    override; auto ids ``base_i`` when the override has none."""
    exts = col_def.get("extensions")
    if not exts:
        return [col_def]
    base = {k: v for k, v in col_def.items() if k != "extensions"}
    out = []
    for i, ext in enumerate(exts):
        d = copy.deepcopy(base)
        d.update(ext)
        if "id" not in ext:
            d["id"] = f"{base.get('id', 'col')}_{i}"
        out.append(d)
    return out


def _table_deps(tdef: dict) -> set[str]:
    deps: set[str] = set()
    op = tdef.get("operation", "source")
    if op in (
        "extend", "project", "map", "sink", "grouping_sets", "sessions",
        "order_stat", "distinct", "distinct_sketch", "heavy_hitters",
        "m4", "time_weighted", "counter", "value_hist", "lttb",
        "window_aggregate", "dedup", "stream_sink",
        "text_analysis", "dedup_exact", "dedup_minhash", "quality_filter",
        "keep_latest", "dedup_clusters", "sample_stratified",
        "remove_boilerplate", "shuffle", "components", "dedup_spans",
        "audio_features", "video_features", "pack",
        "ewma", "anomaly", "cusum", "corr_pairs", "rolling_corr", "bm25",
        "tfidf", "semdedup", "bpe", "holt_winters",
    ):
        deps.add(tdef["source"])
    elif op == "decontaminate":
        deps.update((tdef["source"], tdef["bench"]))
    elif op == "lm_score":
        deps.add(tdef["source"])
        if "ref" in tdef:
            deps.add(tdef["ref"])
    elif op in ("join", "product", "union", "intersect", "except", "sql"):
        deps.update(tdef.get("inputs", []))
    if op == "source" and isinstance(tdef.get("realtime"), dict):
        deps.add(tdef["realtime"]["raw"])
    elif op == "aggregate":
        deps.add(tdef["source"])
    elif op == "asof_join":
        deps.add(tdef["left"])
        deps.add(tdef["right"])
    for cdef in tdef.get("columns", []):
        for c in expand_extensions(cdef):
            cop = c.get("operation")
            if cop == "link":
                deps.add(c["linked_table"])
            elif cop == "compose":
                deps.add(c["linked_table"])
            elif cop == "aggregate":
                deps.add(c["fact_table"])
    # explicit ordering for side-effect chains the data flow can't
    # express (a tier `source` reading a tier `sink`'s root goes
    # through the filesystem, not through a table reference)
    after = tdef.get("after", [])
    deps.update([after] if isinstance(after, str) else after)
    deps.discard(tdef["id"])
    return deps


def stratify(spec: dict) -> list[list[str]]:
    """Kahn-style layer stratification (reference Topology.py:69-99).
    Returns table ids in dependency layers; raises on cycles instead
    of the reference's silent drop (Topology.py:95-96)."""
    tdefs = {t["id"]: t for t in spec["tables"]}
    remaining = dict(tdefs)
    done: set[str] = set()
    layers: list[list[str]] = []
    while remaining:
        # a dep is satisfied when already built, or not defined in the
        # workflow at all (pre-bound data injected programmatically)
        layer = [
            tid
            for tid, td in remaining.items()
            if all(d in done or d not in tdefs for d in _table_deps(td))
        ]
        if not layer:
            raise ValueError(
                f"dependency cycle or unresolved tables: {sorted(remaining)}"
            )
        layers.append(sorted(layer))
        for tid in layer:
            done.add(tid)
            remaining.pop(tid)
    return layers


class Workflow:
    """Compiled workflow: dict of table id → DataFrame, built lazily
    in dependency order. Mirrors the reference's programmatic entry
    (SURVEY.md §3 entry point 2): bind input frames, execute, read
    results — except 'execute' just *builds plans*; Spark actions
    happen when the caller collects/writes."""

    def __init__(
        self,
        spec: dict | str,
        spark: SparkSession,
        data: dict[str, DataFrame] | None = None,
        allow_lambda: bool = False,
        reference_compat: bool = False,
    ):
        if isinstance(spec, str):
            spec = json.loads(strip_comments(spec))
        self.spec = spec
        self.spark = spark
        self.allow_lambda = allow_lambda
        # reference_compat reproduces two reference behaviors its
        # workflows rely on that are deliberately NOT default here:
        # (1) order-sensitive column ops without order_by use implicit
        #     physical row order (README.md:109-121) via a hidden
        #     __row_order__ = monotonically_increasing_id() column —
        #     sound only for small single-split sources, which is the
        #     reference's scale; explicit order_by is the 100 TB path.
        # (2) user callables in calculate run row-at-a-time inside
        #     each Arrow batch (Column.py:552-559's Series/row apply),
        #     instead of this engine's vectorized Series convention.
        self.reference_compat = reference_compat
        self.tables: dict[str, DataFrame] = dict(data or {})
        self.streams: dict[str, Any] = {}  # stream_sink id → StreamingQuery
        import_modules(spec.get("imports", []), spark)
        self._order = [t["id"] for t in spec["tables"]]
        self._tdefs = {t["id"]: t for t in spec["tables"]}
        self._normalize_operations()
        self.layers = stratify(self.spec)

    def _normalize_operations(self) -> None:
        """Reference default-operation rules (Table.py:162-190): no
        ``operation`` means noop for the FIRST table and extend-of-the-
        previous-table for later ones; ``noop`` is a data-bound table.
        Normalizing up front keeps stratify()'s dependency extraction
        exact for reference-style specs."""
        for i, tid in enumerate(self._order):
            td = self._tdefs[tid]
            op = td.get("operation")
            if op == "noop":
                td["operation"] = "data"
            elif op is None and td.get("function"):
                self._normalize_function_table(td)
            elif op is None and "path" not in td:
                if i == 0 or tid in self.tables:
                    td["operation"] = "data"
                else:
                    td["operation"] = "extend"
                    td.setdefault("source", self._order[i - 1])
            elif op == "extend" and "source" not in td:
                if i == 0:
                    raise ValueError(
                        f"table {tid!r}: operation 'extend' with no "
                        "'source' cannot be the first table — there is "
                        "no predecessor to extend"
                    )
                td["source"] = self._order[i - 1]

    def _normalize_function_table(self, td: dict) -> None:
        """Reference T3 function tables (Table.py:192-203: a table def
        whose ``function`` populates it) rewritten to this engine's
        explicit operations, so reference workflow JSONs — e.g.
        examples/example1.json's pandas:read_csv source and
        pandas:DataFrame.to_csv sink — compile without edits:

        - ``pandas:read_csv``  -> distributed csv ``source`` (model
          filepath_or_buffer -> path; nrows -> limit)
        - ``pandas:DataFrame.to_csv`` -> csv ``sink`` on inputs[0]
          (path_or_buf -> path; written as a single part file so a
          downstream pandas reader sees one csv)
        - 0 inputs -> ``function_source`` (driver-side callable
          returning a pandas frame, reference Table.py:499)
        - 1 input  -> ``map`` (mapInPandas; needs ``schema``)
        """
        fn = td["function"]
        model = td.get("model") or {}
        inputs = td.get("inputs") or []
        if fn == "pandas:read_csv":
            td["operation"] = "source"
            td["format"] = "csv"
            td["path"] = model["filepath_or_buffer"]
            if "nrows" in model:
                td["limit"] = int(model["nrows"])
            # pandas treats "null"/"NULL"/... as NaN (its default NA
            # token list); Spark csv's default nullValue is only "".
            # Without this, one literal "null" cell makes inferSchema
            # demote the whole column to string (^GSPC.csv 2016-06-29).
            td["options"] = {"nullValue": "null", **(td.get("options") or {})}
        elif fn in ("pandas:DataFrame.to_csv", "pandas:to_csv"):
            td["operation"] = "sink"
            td["format"] = "csv"
            td["path"] = model["path_or_buf"]
            td["source"] = inputs[0]
            td["single_file"] = True
        elif fn == "lambdo.std:join":
            # reference std.py:15-57 — left-join onto the first table;
            # model.keys = [left_on, right_on_i...] (absent → join by
            # row number), model.suffixes = [main, *rights]
            td["operation"] = "join"
            n_right = len(inputs) - 1
            ks = model.get("keys") or []
            if ks:
                left_on, keys = ks[0], []
                for i in range(n_right):
                    r = ks[i + 1] if i + 1 < len(ks) else None
                    if r is None:
                        keys.append(None)
                    elif r == left_on:
                        keys.append([r] if isinstance(r, str) else list(r))
                    else:
                        # pd.merge(left_on=, right_on=) with DIFFERENT
                        # names then drop of the right key (std.py:53)
                        keys.append(
                            {
                                "left": [left_on] if isinstance(left_on, str) else list(left_on),
                                "right": [r] if isinstance(r, str) else list(r),
                            }
                        )
                td["keys"] = keys
            sfx = model.get("suffixes") or []
            if sfx:
                td["left_suffix"] = sfx[0] or None
                td["suffixes"] = [
                    sfx[i + 1] if i + 1 < len(sfx) else f"_{i + 1}"
                    for i in range(n_right)
                ]
        elif fn == "lambdo.std:aggregate":
            # reference std.py:59-134 — group by model.keys, attach
            # model.aggregations (each {function, inputs, id/outputs})
            td["operation"] = "aggregate"
            td["source"] = inputs[0]
            ks = model["keys"]
            td["keys"] = [ks] if isinstance(ks, str) else list(ks)
            aggs = []
            for a in model.get("aggregations", []):
                a = dict(a)
                if "outputs" in a and "id" not in a:
                    a["id"] = a.pop("outputs")
                _rewrite_wellknown_function(a)
                if "kernel" not in a and a.get("function"):
                    raise ValueError(
                        f"lambdo.std:aggregate function {a['function']!r} "
                        "has no registry kernel; use operation "
                        "'aggregate' with a kernel name"
                    )
                aggs.append(a)
            td["aggregations"] = aggs
        elif not inputs:
            td["operation"] = "function_source"
        elif len(inputs) == 1:
            td["operation"] = "map"
            td["source"] = inputs[0]
        else:
            raise ValueError(
                f"table '{td.get('id')}': N-input function tables need an "
                "explicit operation (join/union/...)"
            )

    def execute(self) -> dict[str, DataFrame]:
        for layer in self.layers:
            for tid in layer:
                self.tables[tid] = self._build_table(self._tdefs[tid])
        return self.tables

    def await_streams(self, timeout: int | None = None) -> None:
        """Block until every ``stream_sink`` query terminates (for
        availableNow catch-up runs), then stop them. ``timeout`` is
        per-query, in seconds."""
        for q in self.streams.values():
            q.awaitTermination(timeout)
            q.stop()

    # -------------------------------------------------------- streaming
    def _stream_source(self, tdef: dict) -> DataFrame:
        """``"stream": true`` source → readStream over the same path.
        File streams need an explicit schema: take ``"schema"`` (DDL
        string) or infer it from the existing batch files. An optional
        ``"watermark": {"ts": col, "delay": "10 minutes"}`` arms
        event-time finality for downstream window_aggregate / dedup /
        append sinks."""
        fmt = tdef.get("format", "parquet")
        schema = tdef.get("schema")
        if schema is None:
            # infer with the SAME reader recipe the batch `source` op
            # uses (options + csv header/inferSchema defaults) — a bare
            # read would see a csv header row as data and hand the
            # stream an all-string _c0/_c1 schema
            from lambdo_spark.operators.table_ops import source as _src

            schema = _src(
                self.spark, fmt, tdef["path"], tdef.get("options")
            ).schema
        reader = self.spark.readStream.schema(schema).format(fmt)
        for k, v in (tdef.get("options") or {}).items():
            reader = reader.option(k, v)
        df = reader.load(tdef["path"])
        wm = tdef.get("watermark")
        if wm:
            from pyspark.sql import functions as F

            # withWatermark requires TIMESTAMP; parquet files written
            # without a zone scan as TIMESTAMP_NTZ. The session zone is
            # pinned to UTC (session.py), so the cast is epoch-exact.
            if dict(df.dtypes).get(wm["ts"]) == "timestamp_ntz":
                df = df.withColumn(wm["ts"], F.col(wm["ts"]).cast("timestamp"))
            df = df.withWatermark(wm["ts"], wm["delay"])
        return df

    # --------------------------------------------------- kernel resolution
    def _eval_lambda(self, src: str):
        """Inline lambda strings (reference resolve.py:24-31,
        tests/test_table_populate.py:49-50) — eval of workflow-supplied
        code, so gated behind the explicit ``allow_lambda`` opt-in."""
        if not self.allow_lambda:
            raise ValueError(
                f"inline lambda kernels ({src!r}) require "
                "Workflow(..., allow_lambda=True) — refusing to eval "
                "workflow-supplied code by default"
            )
        return eval(src)  # noqa: S307 — explicit opt-in above

    def _kernel_ref(self, c: dict, rowwise: bool = False):
        """``kernel``/``function`` field → registry name (string,
        resolved by column_ops) or an ad-hoc user Kernel wrapping a
        ``module:attr`` callable / inline lambda (reference
        resolve.py:14-49). User callables receive the input columns as
        positional pd.Series (the reference's calling convention) and
        must be vectorized: return a Series (calculate) or a scalar
        (roll/all/aggregate)."""
        from lambdo_spark.functions.registry import user_kernel

        ref = c.get("kernel", c.get("function"))
        if ref is None:
            raise ValueError(f"column '{c.get('id')}' needs a kernel/function")
        returns = c.get("returns", "double")
        if callable(ref):
            fn = ref
        elif ref.strip().startswith("lambda "):
            fn = self._eval_lambda(ref)
        elif ":" in ref:
            fn = resolve_callable(ref)
        else:
            return ref  # registry kernel name
        if rowwise:
            # reference calculate convention (Column.py:552-559):
            # 1 input -> fn per value (Series.apply); N inputs -> fn
            # per row ndarray (DataFrame.apply axis=1). Exact but
            # row-at-a-time inside each Arrow batch — the slow path,
            # only for reference_compat workflows.
            import pandas as pd

            def _row_at_a_time(cols, _fn=fn, **kw):
                if len(cols) == 1:
                    return cols[0].apply(lambda v: _fn(v, **kw))
                frame = pd.concat(cols, axis=1)
                return frame.apply(lambda r: _fn(r.values, **kw), axis=1)

            return user_kernel(
                _row_at_a_time, name=str(c.get("id", "user")), returns=returns
            )
        return user_kernel(
            lambda cols, **kw: fn(*cols, **kw),
            name=str(c.get("id", "user")),
            returns=returns,
        )

    def _batch_callable(self, ref: str):
        """T3 map-table function: module:attr, or (opt-in) a lambda."""
        if ref.strip().startswith("lambda "):
            return self._eval_lambda(ref)
        return resolve_callable(ref)

    # ------------------------------------------------------------ build
    def _build_table(self, tdef: dict) -> DataFrame:
        df = self._populate(tdef)
        order_by = tdef.get("order_by")
        partition_by = tdef.get("partition_by")
        drop_after: list[str] = []
        for cdef in tdef.get("columns", []):
            for c in expand_extensions(cdef):
                df = self._eval_column(df, c, order_by, partition_by)
                if c.get("exclude"):
                    drop_after.append(c["id"])
        rf = tdef.get("row_filter")
        if rf:
            df = T.row_filter(
                df,
                dropna=rf.get("dropna", False),
                predicate=rf.get("predicate"),
                sample=rf.get("sample"),
                slice_spec=rf.get("slice"),
                order_by=rf.get("order_by", order_by),
            )
        if drop_after:
            df = df.drop(*drop_after)
        if "__row_order__" in df.columns:  # reference_compat helper col
            df = df.drop("__row_order__")
        cf = tdef.get("column_filter")
        if cf is not None:
            if isinstance(cf, dict):
                df = T.column_filter(df, exclude=cf.get("exclude"))
            else:
                df = T.column_filter(df, keep=cf)
        return df

    def _populate(self, tdef: dict) -> DataFrame:
        op = tdef.get("operation", "source")
        tid = tdef["id"]
        if op == "data":  # T1 noop — programmatic injection
            if tid not in self.tables:
                raise ValueError(f"table '{tid}' declared as data but not bound")
            return self.tables[tid]
        if op == "source":
            if tdef.get("stream"):
                return self._stream_source(tdef)
            if tdef.get("format") == "tier":
                # snapshot-isolated read of an Iceberg-layout table,
                # with optional manifest-stat file pruning. Two forms:
                # `tier: "1h"` reads a retention-pipeline root (path =
                # --out of retention/refresh; supports read-time
                # gap-fill); no/empty `tier` reads a table root
                # directly (e.g. one written by a tier sink).
                prune = tdef.get("prune")
                if prune:
                    prune = {
                        c: tuple(v) if isinstance(v, list) else v
                        for c, v in prune.items()
                    }
                tier = tdef.get("tier", "1h")
                if tier:
                    rt = tdef.get("realtime")
                    if isinstance(rt, dict):
                        # real-time continuous aggregate: finalized
                        # tier ∪ fresh rollup of the raw table's
                        # un-materialized tail (rollup/realtime.py);
                        # `raw` names another workflow table
                        from lambdo_spark.rollup.realtime import read_realtime_tier

                        return read_realtime_tier(
                            self.spark, tdef["path"], tier,
                            self.tables[rt["raw"]],
                            url_col=rt.get("key", "url"),
                            ts_col=rt.get("ts", "warc_ts"),
                            text_col=rt.get("text", "text"),
                            lang_col=rt.get("lang", "lang"),
                            gapfill=bool(tdef.get("gapfill", False)),
                            prune=prune,
                            cascade=bool(rt.get("cascade", False)),
                        )
                    from lambdo_spark.rollup.incremental import read_finalized_tier

                    return read_finalized_tier(
                        self.spark, tdef["path"], tier,
                        gapfill=bool(tdef.get("gapfill", False)), prune=prune,
                    )
                from lambdo_spark.sources.iceberg_layout import IcebergLayoutTable

                # direct table-root read with the full lakehouse knob
                # set: `snapshot` / `as_of` time travel, `branch` refs,
                # and `changes: [from, to]` incremental (CDC) reads
                tbl = IcebergLayoutTable(
                    tdef["path"], branch=tdef.get("branch", "main")
                )
                if tdef.get("changes") is not None:
                    lo, hi = tdef["changes"]
                    return tbl.read_changes(
                        self.spark, int(lo),
                        None if hi is None else int(hi),
                    )
                return tbl.read_tier(
                    self.spark,
                    snapshot_id=(
                        None if tdef.get("snapshot") is None
                        else int(tdef["snapshot"])
                    ),
                    as_of=(
                        None if tdef.get("as_of") is None
                        else float(tdef["as_of"])
                    ),
                    prune=prune,
                )
            df = T.source(
                self.spark, tdef.get("format", "parquet"), tdef["path"],
                tdef.get("options"),
            )
            if tdef.get("limit") is not None:  # pandas:read_csv nrows
                df = df.limit(int(tdef["limit"]))
            return df
        if op == "function_source":
            # reference T3 with 0 inputs (Table.py:499: func(**model)
            # returns a fully populated frame) — the general compat
            # fallback for driver-side source callables; well-known
            # idioms (pandas:read_csv) are rewritten to distributed
            # scans in _normalize_operations instead
            fn = self._batch_callable(tdef["function"])
            pdf = fn(**(tdef.get("model") or {}))
            return self.spark.createDataFrame(pdf)
        if op == "sql":
            # Spark-SQL escape hatch (beyond the reference — it has no
            # SQL surface at all, SURVEY §3): each input table
            # registers as a temp view named by its workflow id, and
            # the query plans through Catalyst like any compiled stage
            # (pushdown / pruning / AQE / broadcast all apply).
            for dep in tdef.get("inputs", []):
                self.tables[dep].createOrReplaceTempView(dep)
            return self.spark.sql(tdef["query"])
        if op == "extend":
            return T.extend(self.tables[tdef["source"]])
        if op == "project":
            return T.project(
                self.tables[tdef["source"]], tdef["inputs"], tdef.get("outputs")
            )
        if op == "product":
            return T.product([self.tables[t] for t in tdef["inputs"]])
        if op == "join":
            return T.join_tables(
                [self.tables[t] for t in tdef["inputs"]],
                tdef.get("keys", []),
                tdef.get("suffixes"),
                tdef.get("left_suffix"),
            )
        if op == "aggregate":
            return T.aggregate_table(
                self.tables[tdef["source"]], tdef["keys"], tdef["aggregations"]
            )
        if op == "map":
            # T3 one-input function table (reference Table.py:461-506):
            # a named vectorized batch kernel over mapInPandas
            return T.map_table(
                self.tables[tdef["source"]],
                self._batch_callable(tdef["function"]),
                tdef["schema"],
            )
        if op == "union":
            return T.union_tables(
                [self.tables[t] for t in tdef["inputs"]],
                distinct=tdef.get("distinct", False),
            )
        if op == "intersect":
            a, b = tdef["inputs"]
            return T.intersect_tables(self.tables[a], self.tables[b])
        if op == "except":
            a, b = tdef["inputs"]
            return T.except_tables(self.tables[a], self.tables[b])
        if op == "asof_join":
            return T.asof_join(
                self.tables[tdef["left"]],
                self.tables[tdef["right"]],
                tdef["on"],
                tdef["left_ts"],
                tdef["right_ts"],
                tdef["values"],
                tdef.get("direction", "backward"),
                tolerance=tdef.get("tolerance"),
            )
        if op == "grouping_sets":
            return T.aggregate_grouping_sets(
                self.tables[tdef["source"]], tdef["keys"], tdef["aggregations"],
                mode=tdef.get("mode", "rollup"),
                gid_col=tdef.get("gid_col", "grouping_id"),
            )
        if op == "sessions":
            from lambdo_spark.rollup.timeseries import session_table

            return session_table(
                self.tables[tdef["source"]], tdef["keys"], tdef["ts"],
                int(tdef["gap_seconds"]), tdef.get("tiebreak", ()),
            )
        if op == "order_stat":
            from lambdo_spark.rollup.timeseries import order_stat

            return order_stat(
                self.tables[tdef["source"]], tdef["keys"], tdef["value"],
                float(tdef["q"]), tdef.get("tiebreak", ()),
                tdef.get("output", "order_stat"), tdef.get("exact", True),
            )
        if op == "m4":
            from lambdo_spark.rollup.timeseries import m4_downsample

            return m4_downsample(
                self.tables[tdef["source"]], tdef["value"], tdef["ts"],
                int(tdef["tier_seconds"]), tdef["keys"],
                bucket_col=tdef.get("bucket_col", "bucket_s"),
            )
        if op == "lttb":
            from lambdo_spark.rollup.timeseries import lttb_downsample

            return lttb_downsample(
                self.tables[tdef["source"]], tdef["value"], tdef["ts"],
                int(tdef["tier_seconds"]), tdef["keys"],
                bucket_col=tdef.get("bucket_col", "bucket_s"),
            )
        if op == "ewma":
            src = self.tables[tdef["source"]]
            if src.isStreaming:
                # stateful twin: same recursion, incremental state
                # (streaming/smoothing.py); requires single key + ts
                from lambdo_spark.streaming.smoothing import streaming_ewma

                (key,) = tdef["keys"]
                # "ts" alone is a valid streaming spec — only reach
                # for order[0] when ts is absent (a dict.get default
                # would evaluate tdef["order"] eagerly and KeyError).
                return streaming_ewma(
                    src, float(tdef["alpha"]), key_col=key,
                    ts_col=(tdef["ts"] if "ts" in tdef
                            else tdef["order"][0]),
                    value_col=tdef["value"],
                    state_ttl_s=tdef.get("state_ttl_s"),
                )
            from lambdo_spark.rollup.analytics import ewma

            return ewma(
                src, tdef["value"], tdef["order"],
                tdef["keys"], float(tdef["alpha"]),
                output=tdef.get("output", "ewma"),
                adjust=bool(tdef.get("adjust", True)),
            )
        if op == "anomaly":
            src = self.tables[tdef["source"]]
            if src.isStreaming:
                from lambdo_spark.streaming.detect import streaming_anomaly

                (key,) = tdef["keys"]
                return streaming_anomaly(
                    src,
                    period_s=int(tdef.get("period_seconds", 86400)),
                    lookback=int(tdef.get("lookback", 7)),
                    min_prior=int(tdef.get("min_prior", 3)),
                    threshold=float(tdef.get("threshold", 3.0)),
                    key_col=key, bucket_col=tdef["bucket"],
                    value_col=tdef["value"],
                    state_ttl_s=tdef.get("state_ttl_s"),
                )
            from lambdo_spark.rollup.analytics import anomaly_seasonal

            return anomaly_seasonal(
                src, tdef["value"], tdef["bucket"],
                tdef["keys"],
                period_s=int(tdef.get("period_seconds", 86400)),
                lookback=int(tdef.get("lookback", 7)),
                min_prior=int(tdef.get("min_prior", 3)),
                threshold=float(tdef.get("threshold", 3.0)),
            )
        if op == "cusum":
            src = self.tables[tdef["source"]]
            if src.isStreaming:
                from lambdo_spark.streaming.detect import streaming_cusum

                (key,) = tdef["keys"]
                return streaming_cusum(
                    src, int(tdef.get("target", 0)),
                    slack=int(tdef.get("slack", 0)), key_col=key,
                    ts_col=(tdef["ts"] if "ts" in tdef
                            else tdef["order"][0]),
                    value_col=tdef["value"],
                    state_ttl_s=tdef.get("state_ttl_s"),
                )
            from lambdo_spark.rollup.analytics import cusum

            return cusum(
                src, tdef["value"], tdef["order"],
                tdef["keys"], target=tdef.get("target"),
                slack=tdef.get("slack", 0),
            )
        if op == "corr_pairs":
            from lambdo_spark.rollup.analytics import corr_pairs

            return corr_pairs(
                self.tables[tdef["source"]], tdef["value"], tdef["series"],
                tdef["bucket"], min_buckets=int(tdef.get("min_buckets", 2)),
                max_series=tdef.get("max_series", 1000),
            )
        if op == "holt_winters":
            from lambdo_spark.rollup.analytics import holt_winters

            return holt_winters(
                self.tables[tdef["source"]], tdef["value"], tdef["order"],
                tdef["keys"], int(tdef["season_length"]),
                alpha=float(tdef.get("alpha", 0.3)),
                beta=float(tdef.get("beta", 0.1)),
                gamma=float(tdef.get("gamma", 0.2)),
                steps=int(tdef.get("steps", 1)),
                mode=tdef.get("mode", "forecast"),
            )
        if op == "rolling_corr":
            from lambdo_spark.rollup.analytics import rolling_corr

            return rolling_corr(
                self.tables[tdef["source"]], tdef["x"], tdef["y"],
                tdef["order"], tdef["keys"], int(tdef["window"]),
                min_periods=(
                    int(tdef["min_periods"]) if "min_periods" in tdef else None
                ),
                output=tdef.get("output", "rolling_corr"),
            )
        if op == "bm25":
            from lambdo_spark.functions.ir import bm25_scores, bm25_topk

            src = self.tables[tdef["source"]]
            kw = dict(
                id_col=tdef.get("id_col", "doc_id"),
                text_col=tdef.get("text", "text"),
                k1=float(tdef.get("k1", 1.2)),
                b=float(tdef.get("b", 0.75)),
            )
            if "k" in tdef:
                return bm25_topk(src, tdef["query"], k=int(tdef["k"]), **kw)
            return bm25_scores(src, tdef["query"], **kw)
        if op == "tfidf":
            from lambdo_spark.functions.ir import tfidf_scores

            return tfidf_scores(
                self.tables[tdef["source"]], tdef["vocab"],
                id_col=tdef.get("id_col", "doc_id"),
                text_col=tdef.get("text", "text"),
            )
        if op == "bpe":
            from lambdo_spark.functions.bpe import bpe_encode, train_bpe

            src = self.tables[tdef["source"]]
            if "merges" in tdef:
                merges = [tuple(m) for m in tdef["merges"]]
            else:
                merges = train_bpe(
                    src, int(tdef["num_merges"]),
                    text_col=tdef.get("text", "text"),
                    min_count=int(tdef.get("min_count", 1)),
                )
            return bpe_encode(
                src, merges,
                id_col=tdef.get("id_col", "doc_id"),
                text_col=tdef.get("text", "text"),
            )
        if op == "semdedup":
            from lambdo_spark.functions.semdedup import semdedup

            return semdedup(
                self.tables[tdef["source"]], tau=float(tdef["tau"]),
                k=int(tdef.get("k", 16)), iters=int(tdef.get("iters", 0)),
                id_col=tdef.get("id_col", "vec_id"),
                vec_col=tdef.get("vector", "embedding"),
            )
        if op == "time_weighted":
            from lambdo_spark.rollup.timeseries import (
                time_weighted,
                time_weighted_downsample,
                time_weighted_finalize,
                time_weighted_partials,
            )

            bcol = tdef.get("bucket_col", "bucket_s")
            fine = int(tdef["tier_seconds"])
            if not tdef.get("merge_to"):
                return time_weighted(
                    self.tables[tdef["source"]], tdef["value"], tdef["ts"],
                    fine, tdef["keys"], bucket_col=bcol,
                    tiebreak=tdef.get("tiebreak", ()),
                )
            coarse = int(tdef["merge_to"])
            tw = time_weighted_downsample(
                time_weighted_partials(
                    self.tables[tdef["source"]], tdef["value"], tdef["ts"],
                    fine, tdef["keys"], bucket_col=bcol,
                ),
                fine, coarse, tdef["keys"], bucket_col=bcol,
            )
            if tdef.get("finalize", True):
                tw = time_weighted_finalize(tw, coarse, bucket_col=bcol)
            return tw
        if op == "counter":
            from lambdo_spark.rollup.timeseries import (
                counter_downsample,
                counter_finalize,
                counter_partials,
            )

            cp = counter_partials(
                self.tables[tdef["source"]], tdef["value"], tdef["ts"],
                int(tdef["tier_seconds"]), tdef["keys"],
                bucket_col=tdef.get("bucket_col", "bucket_s"),
            )
            if tdef.get("merge_to"):
                cp = counter_downsample(
                    cp, int(tdef["merge_to"]), tdef["keys"],
                    bucket_col=tdef.get("bucket_col", "bucket_s"),
                )
            if tdef.get("finalize", True):
                cp = counter_finalize(
                    cp, output=tdef.get("output", "increase")
                )
            return cp
        if op == "value_hist":
            from lambdo_spark.rollup.timeseries import (
                quantile_from_hist,
                value_hist_downsample,
                value_hist_partials,
            )

            vh = value_hist_partials(
                self.tables[tdef["source"]], tdef["value"], tdef["ts"],
                int(tdef["tier_seconds"]), tdef["keys"],
                int(tdef["bin_width"]),
                bucket_col=tdef.get("bucket_col", "bucket_s"),
            )
            if tdef.get("merge_to"):
                vh = value_hist_downsample(
                    vh, int(tdef["merge_to"]), tdef["keys"],
                    bucket_col=tdef.get("bucket_col", "bucket_s"),
                )
            if tdef.get("q") is not None:
                vh = quantile_from_hist(
                    vh, float(tdef["q"]), tdef["keys"],
                    bucket_col=tdef.get("bucket_col", "bucket_s"),
                    output=tdef.get("output", "q_est"),
                )
            return vh
        if op == "distinct":
            from lambdo_spark.rollup.timeseries import distinct_per_bucket

            return distinct_per_bucket(
                self.tables[tdef["source"]], tdef["keys"], tdef["item"],
                tdef.get("output", "n_distinct"), tdef.get("exact", True),
                tdef.get("rsd", 0.05),
            )
        if op == "distinct_sketch":
            from lambdo_spark.rollup.timeseries import (
                distinct_sketch_downsample,
                distinct_sketch_finalize,
                distinct_sketch_partials,
            )

            sk = distinct_sketch_partials(
                self.tables[tdef["source"]], tdef["keys"], tdef["item"],
                tdef["ts"], int(tdef["tier_seconds"]),
                lgk=int(tdef.get("lgk", 12)),
            )
            if tdef.get("merge_to"):
                sk = distinct_sketch_downsample(
                    sk, tdef["keys"], int(tdef["merge_to"])
                )
            if tdef.get("finalize", True):
                sk = distinct_sketch_finalize(
                    sk, output=tdef.get("output", "n_distinct_est")
                )
            return sk
        if op == "text_analysis":
            from lambdo_spark.functions.text import analyze_documents

            return analyze_documents(
                self.tables[tdef["source"]], text_col=tdef.get("text", "text")
            )
        if op == "quality_filter":
            # Gopher/C4 web-text rules (functions/text.py): keep rows
            # passing the composite boolean, or flag them when
            # `flag: "<col>"` is given (filter stays pushdown-friendly
            # — it's one JVM expression over the text column)
            from pyspark.sql import functions as F

            from lambdo_spark.functions.text import gopher_filter

            src = self.tables[tdef["source"]]
            keep = gopher_filter(
                F.col(tdef.get("text", "text")), **(tdef.get("rules") or {})
            )
            flag = tdef.get("flag")
            if flag:
                return src.withColumn(flag, keep)
            return src.where(keep)
        if op == "dedup_exact":
            from lambdo_spark.functions.dedup import dedup_exact

            return dedup_exact(
                self.tables[tdef["source"]],
                id_col=tdef.get("id_col", "doc_id"),
                text_col=tdef.get("text", "text"),
                keep_rows=True,  # table op = surviving rows, all columns
            )
        if op == "keep_latest":
            from lambdo_spark.functions.dedup import dedup_keep_latest

            return dedup_keep_latest(
                self.tables[tdef["source"]],
                tdef["keys"],
                tdef["ts"],
                tdef.get("tiebreak", []),
                n=int(tdef.get("n", 1)),
            )
        if op == "audio_features":
            from lambdo_spark.functions.multimodal import extract_audio_features

            return extract_audio_features(
                self.tables[tdef["source"]],
                id_col=tdef.get("id_col", "doc_id"),
                audio_col=tdef.get("binary", "audio"),
            )
        if op == "video_features":
            from lambdo_spark.functions.multimodal import extract_video_features

            return extract_video_features(
                self.tables[tdef["source"]],
                id_col=tdef.get("id_col", "doc_id"),
                video_col=tdef.get("binary", "video"),
            )
        if op == "dedup_spans":
            from lambdo_spark.functions.exact_substr import (
                remove_duplicate_spans,
            )

            return remove_duplicate_spans(
                self.tables[tdef["source"]],
                id_col=tdef.get("id_col", "doc_id"),
                text_col=tdef.get("text", "text"),
                span_tokens=int(tdef.get("span_tokens", 8)),
                min_count=int(tdef.get("min_count", 2)),
                key=tdef.get("key", "hash128"),
                cache_grams=bool(tdef.get("cache_grams", True)),
            )
        if op == "components":
            from lambdo_spark.functions.cluster import connected_components

            return connected_components(
                self.tables[tdef["source"]],
                src=tdef.get("src", "src"),
                dst=tdef.get("dst", "dst"),
                max_iter=int(tdef.get("max_iter", 50)),
            )
        if op == "pack":
            from lambdo_spark.functions.sampling import pack_sequences

            return pack_sequences(
                self.tables[tdef["source"]],
                tdef["tokens"],
                int(tdef["budget"]),
                tdef["order_by"],
            )
        if op == "shuffle":
            from lambdo_spark.functions.sampling import shuffle_deterministic

            return shuffle_deterministic(
                self.tables[tdef["source"]],
                tdef["unique_keys"],
                seed=str(tdef.get("seed", "42")),
                out_col=tdef.get("out", "shuffle_rank"),
            )
        if op == "decontaminate":
            from lambdo_spark.functions.contamination import decontaminate

            return decontaminate(
                self.tables[tdef["source"]],
                self.tables[tdef["bench"]],
                id_col=tdef.get("id_col", "doc_id"),
                text_col=tdef.get("text", "text"),
                bench_text_col=tdef.get("bench_text"),
                n=int(tdef.get("n", 8)),
                min_hits=int(tdef.get("min_hits", 1)),
                broadcast_bench=bool(tdef.get("broadcast_bench", True)),
                prefilter=tdef.get("prefilter"),
            )
        if op == "lm_score":
            from lambdo_spark.functions.lm import lm_counts, lm_score

            counts = None
            if "ref" in tdef:
                counts = lm_counts(
                    self.tables[tdef["ref"]],
                    id_col=tdef.get("id_col", "doc_id"),
                    text_col=tdef.get("text", "text"),
                )
            return lm_score(
                self.tables[tdef["source"]],
                id_col=tdef.get("id_col", "doc_id"),
                text_col=tdef.get("text", "text"),
                alpha=float(tdef.get("alpha", 0.5)),
                counts=counts,
            )
        if op == "remove_boilerplate":
            from lambdo_spark.functions.text import remove_boilerplate_lines

            return remove_boilerplate_lines(
                self.tables[tdef["source"]],
                id_col=tdef.get("id_col", "doc_id"),
                text_col=tdef.get("text", "text"),
                group_cols=tuple(tdef.get("group_by", ["source"])),
                min_docs=int(tdef.get("min_docs", 5)),
                sep=tdef.get("sep", "\n"),
            )
        if op == "dedup_clusters":
            from lambdo_spark.functions.cluster import dedup_clusters

            return dedup_clusters(
                self.tables[tdef["source"]],
                id_col=tdef.get("id_col", "doc_id"),
                text_col=tdef.get("text", "text"),
                threshold=float(tdef.get("threshold", 0.8)),
                score_col=tdef.get("score"),
            )
        if op == "sample_stratified":
            from lambdo_spark.functions.sampling import sample_stratified

            n_spec = None
            if "quotas" in tdef:  # {stratum: n} mixing recipe
                n_spec = {k: int(v) for k, v in tdef["quotas"].items()}
            elif "n" in tdef:
                n_spec = int(tdef["n"])
            return sample_stratified(
                self.tables[tdef["source"]],
                tdef["keys"],
                n_spec,
                tdef["unique_keys"],
                seed=str(tdef.get("seed", "42")),
                salt_buckets=int(tdef.get("salt_buckets", 16)),
                fraction=(
                    float(tdef["fraction"]) if "fraction" in tdef else None
                ),
            )
        if op == "dedup_minhash":
            from lambdo_spark.functions.dedup import dedup_minhash_lsh

            return dedup_minhash_lsh(
                self.tables[tdef["source"]],
                id_col=tdef.get("id_col", "doc_id"),
                text_col=tdef.get("text", "text"),
                threshold=float(tdef.get("threshold", 0.8)),
                num_hashes=int(tdef.get("num_hashes", 64)),
                bands=int(tdef.get("bands", 16)),
                bucket_cap=int(tdef.get("bucket_cap", 1000)),
                verify=tdef.get("verify", "token"),
            )
        if op == "heavy_hitters":
            from lambdo_spark.rollup.timeseries import heavy_hitters

            return heavy_hitters(
                self.tables[tdef["source"]], tdef["keys"], tdef["item"],
                int(tdef["k"]),
                salt_buckets=int(tdef.get("salt_buckets", 0)),
            )
        if op == "window_aggregate":
            return T.window_aggregate(
                self.tables[tdef["source"]], tdef["ts"], tdef["duration"],
                tdef.get("keys", []), tdef["aggregations"],
                bucket_col=tdef.get("bucket_col", "bucket_s"),
                slide=tdef.get("slide"),
            )
        if op == "dedup":
            src = self.tables[tdef["source"]]
            return T.dedup_rows(
                src, tdef.get("keys"),
                within_watermark=tdef.get(
                    "within_watermark", src.isStreaming
                ),
            )
        if op == "stream_sink":
            src = self.tables[tdef["source"]]
            if not src.isStreaming:
                raise ValueError(
                    f"stream_sink '{tid}': source '{tdef['source']}' is a "
                    "batch table — use operation 'sink', or mark the "
                    "source table with \"stream\": true"
                )
            if tdef.get("format") == "upsert":
                # exactly-once streaming MERGE into an Iceberg-layout
                # table (streaming/upsert_stream.py): each micro-batch
                # upserts by `keys`; merge-on-read by default so the
                # per-batch cost is O(batch), never a base rewrite
                from lambdo_spark.streaming.upsert_stream import (
                    streaming_upsert_writer,
                )

                writer = streaming_upsert_writer(
                    src, tdef["path"], list(tdef["keys"]), tdef["checkpoint"],
                    mode=tdef.get("mode", "merge-on-read"),
                    tag_prefix=tdef.get("tag_prefix", f"upsert:{tid}"),
                    part_col=tdef.get("part_col", "part"),
                )
            else:
                writer = (
                    src.writeStream.format(tdef.get("format", "parquet"))
                    .option("path", tdef["path"])
                    .option("checkpointLocation", tdef["checkpoint"])
                    .outputMode(tdef.get("output_mode", "append"))
                )
            if tdef.get("interval"):
                writer = writer.trigger(processingTime=tdef["interval"])
            else:
                writer = writer.trigger(availableNow=True)
            self.streams[tid] = writer.start()
            return src
        if op == "sink":
            # reference parity: a function table doubling as a sink
            # (pandas:DataFrame.to_csv, examples/example1.json:14-22);
            # here an eager parquet/csv write, returning the source
            src = self.tables[tdef["source"]]
            fmt = tdef.get("format", "parquet")
            if fmt == "tier":
                # checkpointed Iceberg-layout write: resumable, MVCC
                # snapshot, per-partition lineage + file column stats.
                # `part_col` must exist (use with_part upstream or any
                # string-able column); re-running the workflow skips
                # committed partitions.
                from lambdo_spark.sources.iceberg_layout import IcebergLayoutTable

                IcebergLayoutTable(tdef["path"]).write_tier(
                    src,
                    part_col=tdef.get("part_col", "part"),
                    input_snapshot=tdef.get("input_snapshot", f"workflow:{tdef['source']}"),
                )
                return src
            if fmt == "merge":
                # batch keyed MERGE (upsert) into an existing
                # Iceberg-layout table — the batch twin of the
                # streaming `stream_sink format:"upsert"`; `mode`
                # picks copy-on-write vs merge-on-read (O(delta),
                # zero base rewrite)
                from lambdo_spark.sources.iceberg_layout import IcebergLayoutTable

                IcebergLayoutTable(
                    tdef["path"], branch=tdef.get("branch", "main")
                ).merge_rows(
                    src,
                    keys=tdef["keys"],
                    mode=tdef.get("mode", "merge-on-read"),
                    idempotency_tag=tdef.get("tag"),
                )
                return src
            out = src.coalesce(1) if tdef.get("single_file") else src
            w = out.write.mode(tdef.get("mode", "overwrite"))
            if fmt == "csv":
                w = w.option("header", True)
            w.format(fmt).save(tdef["path"])
            return src
        raise ValueError(f"unknown table operation '{op}'")

    def _eval_column(
        self, df: DataFrame, c: dict, t_order: list | None, t_part: list | None
    ) -> DataFrame:
        out = self._eval_column_op(df, c, t_order, t_part)
        # C9 — fillna applied post-attach for ANY column op (reference
        # Column.py:437-496); the aggregate op also accepts it inline
        fv = c.get("fillna_value")
        if fv is not None and c.get("operation") != "aggregate":
            from pyspark.sql import functions as F

            cid = c["id"]
            out = out.withColumn(cid, F.coalesce(F.col(cid), F.lit(fv)))
        return out

    def _eval_column_op(
        self, df: DataFrame, c: dict, t_order: list | None, t_part: list | None
    ) -> DataFrame:
        if isinstance(c.get("inputs"), str):  # reference allows a bare
            c = {**c, "inputs": [c["inputs"]]}  # string (Column.py:442)
        if c.get("function") or c.get("kernel"):
            c = dict(c)
            _rewrite_wellknown_function(c)
        op = c.get("operation")
        if op is None and (c.get("function") or c.get("kernel")):
            # reference operation inference (Column.py:74-104):
            # window one/1 -> calculate, all -> all, numeric -> roll
            w = str(c.get("window", "one"))
            if w in ("one", "1"):
                op = "calculate"
            elif w == "all":
                op = "all"
            else:
                op, c["window"] = "roll", int(w)
            if op == "all" and isinstance(c.get("kernel"), str):
                # reference specs use window=all for elementwise
                # whole-column fns (example5.json's to_datetime);
                # a scalar-only registry kernel IS elementwise
                from lambdo_spark.functions.registry import kernels as _kreg

                k = _kreg().get(c["kernel"])
                if k is not None and k.expr is not None and k.agg is None:
                    op = "calculate"
        if op is None:  # C7 noop — reference existing column
            return df
        if (
            self.reference_compat
            and not (c.get("order_by") or t_order)
            and op in ("roll", "shift", "delta", "rate", "locf")
        ):
            # reference implicit physical row order (README.md:109-121)
            if "__row_order__" not in df.columns:
                from pyspark.sql import functions as F

                df = df.withColumn(
                    "__row_order__", F.monotonically_increasing_id()
                )
            t_order = ["__row_order__"]
        out = c["id"]
        order_by = c.get("order_by", t_order)
        partition_by = c.get("partition_by", t_part)
        if op == "calculate":
            model = c.get("model")
            if c.get("train") is not None or (
                isinstance(model, str) and model.startswith("$file:")
            ):
                # C10 (reference Column.py:844-956): fit-or-load the
                # model before applying; artifact persisted by $file: ref
                from lambdo_spark.functions.train import resolve_model

                model = resolve_model(model, df, c.get("train"))
            return C.calculate(
                df, out,
                self._kernel_ref(c, rowwise=self.reference_compat),
                c["inputs"], model,
            )
        if op == "roll":
            if not order_by:
                raise ValueError(f"roll column '{out}' needs order_by")
            return C.roll(
                df, out, self._kernel_ref(c), c["inputs"], int(c["window"]),
                order_by, partition_by, c.get("model"), c.get("min_periods"),
            )
        if op == "roll_range":
            return C.roll_range(
                df, out, self._kernel_ref(c), c["inputs"], int(c["range_seconds"]),
                c["ts"], partition_by, c.get("model"),
            )
        if op == "shift":
            if not order_by:
                raise ValueError(f"shift column '{out}' needs order_by")
            return C.shift(
                df, out, c["inputs"][0], int(c.get("periods", 1)),
                order_by, partition_by,
            )
        if op == "all":
            return C.window_all(
                df, out, self._kernel_ref(c), c["inputs"], partition_by, order_by,
                c.get("model"),
            )
        if op == "link":
            return C.link(
                df, out, c["keys"], self.tables[c["linked_table"]],
                c["linked_keys"],
            )
        if op == "compose":
            return C.compose(
                df, out, c["link"], self.tables[c["linked_table"]],
                c["linked_keys"], c["target"],
            )
        if op == "aggregate":
            return C.aggregate_column(
                df, out, self.tables[c["fact_table"]], c["keys"],
                c["fact_keys"], self._kernel_ref(c), c.get("measure"),
                c.get("fillna_value"), c.get("model"),
            )
        if op == "sessionize":
            from lambdo_spark.rollup.timeseries import sessionize

            return sessionize(
                df, partition_by or [], c["ts"], int(c["gap_seconds"]),
                c.get("tiebreak", ()), out,
            )
        if op == "delta":
            from lambdo_spark.rollup.timeseries import delta

            if not order_by:
                raise ValueError(f"delta column '{out}' needs order_by")
            return delta(df, out, c["inputs"][0], order_by, partition_by or [])
        if op == "rate":
            from lambdo_spark.rollup.timeseries import rate

            if not order_by:
                raise ValueError(f"rate column '{out}' needs order_by")
            return rate(
                df, out, c["inputs"][0], c["ts"], order_by, partition_by or [],
                c.get("counter_reset", False), int(c.get("scale", 1_000_000)),
            )
        if op == "locf":
            from lambdo_spark.rollup.timeseries import locf

            if not order_by:
                raise ValueError(f"locf column '{out}' needs order_by")
            return locf(df, c["inputs"], order_by, partition_by or [])
        if op == "interpolate":
            from lambdo_spark.rollup.timeseries import interpolate_linear

            return interpolate_linear(
                df, c["inputs"][0], c["bucket"], partition_by or [], out,
                int(c.get("ndigits", 6)),
            )
        raise ValueError(f"unknown column operation '{op}'")


def compile_workflow(
    spec: dict | str, spark: SparkSession, data: dict[str, DataFrame] | None = None
) -> dict[str, DataFrame]:
    """One-shot: build every table's DataFrame; returns id → DataFrame."""
    return Workflow(spec, spark, data).execute()
