"""JVM-side aggregates: lazy javac build + per-session registration.

The one capability the pure-Python surface could not provide (PERF.md
"missing: JVM merge aggregates", VERDICT r8-r11): a BOUNDED-STATE
aggregate that partial-aggregates on the map side. Python grouped-agg
pandas UDFs ship whole groups across the Arrow boundary; the Java
``UserDefinedAggregateFunction`` here plans as
``partial_kmv_bottomk{k}`` below the exchange, so only
``partitions x k`` hashes per group ever shuffle.

Build chain: the JDK (required by Spark itself) compiles
``src/fes/*.java`` once against the installed PySpark jars; the jar is
cached next to the sources and rebuilt when any source is newer.
Registration is runtime-only (``ADD JAR`` + ``registerJavaUDAF``), so
it works on ANY running session — including the driver's vanilla one.
"""

from __future__ import annotations

import os
import shutil
import subprocess

_SRC_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "src")
_JAR = os.path.join(_SRC_DIR, "fes_udaf.jar")
_KS = (8, 16, 32, 64, 128)
_REGISTERED: set = set()


def _pyspark_jars() -> str:
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "jars", "*")


def ensure_jar() -> str:
    """Compile the Java aggregates into a jar (cached; rebuilt when any
    source is newer than the jar). Raises a clear error when no JDK
    compiler is available (runtime-only JREs)."""
    src_files = [
        os.path.join(_SRC_DIR, "fes", f)
        for f in sorted(os.listdir(os.path.join(_SRC_DIR, "fes")))
        if f.endswith(".java")
    ]
    if os.path.exists(_JAR) and all(
        os.path.getmtime(_JAR) >= os.path.getmtime(s) for s in src_files
    ):
        return _JAR
    javac = shutil.which("javac") or os.path.join(
        os.environ.get("JAVA_HOME", ""), "bin", "javac"
    )
    jar = shutil.which("jar") or os.path.join(
        os.environ.get("JAVA_HOME", ""), "bin", "jar"
    )
    if not (javac and os.path.exists(javac)):
        raise RuntimeError(
            "JVM aggregates need a JDK compiler (javac); found none. "
            "Use kmv_distinct(method='window'|'merge') instead."
        )
    # Compile into a per-process temp dir (-d) and jar from THERE: two
    # drivers compiling concurrently must not share .class files or the
    # tmp jar path, and a fresh dir can never pack stale .class files
    # from removed/renamed sources. os.replace keeps the publish atomic.
    import tempfile

    build = tempfile.mkdtemp(prefix="fes_udaf_")
    try:
        subprocess.run(
            [javac, "-cp", _pyspark_jars(), "-d", build, *src_files],
            check=True,
            capture_output=True,
        )
        # Jar into the temp dir, but PUBLISH via a tmp file NEXT TO the
        # destination: os.replace across filesystems (mkdtemp is often
        # tmpfs) raises EXDEV and would not be atomic anyway
        # (ADVICE-r13). Same-dir replace is always same-fs + atomic.
        tmp = os.path.join(build, "fes_udaf.jar")
        subprocess.run(
            [jar, "cf", tmp, "-C", build, "fes"],
            check=True,
            capture_output=True,
        )
        stage = f"{_JAR}.{os.getpid()}.tmp"
        shutil.copyfile(tmp, stage)
        os.replace(stage, _JAR)
    finally:
        shutil.rmtree(build, ignore_errors=True)
    return _JAR


def _register(spark, name: str, cls: str) -> str:
    key = (spark.sparkContext.applicationId, name)
    if key in _REGISTERED:
        return name
    path = ensure_jar()
    spark.sql(f"ADD JAR '{path}'")
    spark.udf.registerJavaUDAF(name, cls)
    _REGISTERED.add(key)
    return name


def register_kmv_bottomk(spark, k: int) -> str:
    """Idempotently register ``kmv_bottomk{k}`` on this session; returns
    the SQL function name."""
    if k not in _KS:
        raise ValueError(f"k must be one of {_KS}, got {k}")
    return _register(spark, f"kmv_bottomk{k}", f"fes.KmvBottomK{k}")


def register_kmv_sample_bottomk(spark, k: int) -> str:
    """Idempotently register the payload-carrying sample aggregate
    ``kmv_sample_bottomk{k}`` (hash, key, value) -> array of values."""
    if k not in (64, 256):
        raise ValueError(f"k must be 64 or 256, got {k}")
    return _register(
        spark, f"kmv_sample_bottomk{k}", f"fes.KmvSampleBottomK{k}"
    )


def register_dyadic_hist(spark, k: int) -> str:
    """Idempotently register the adaptive dyadic-histogram quantile
    sketch ``dyadic_hist{k}`` (non-negative long) -> flat long array
    [level, b1, c1, ...] — merge-order-invariant exact bucket counts at
    the coarsest-needed resolution (fes.DyadicHist)."""
    if k not in (64, 256):
        raise ValueError(f"k must be 64 or 256, got {k}")
    return _register(spark, f"dyadic_hist{k}", f"fes.DyadicHist{k}")


def register_dyadic_histw(spark, k: int) -> str:
    """Idempotently register the WEIGHTED-input dyadic histogram
    ``dyadic_histw{k}`` (value, count) — lets a codegen pre-aggregation
    feed distinct values instead of raw rows; state identical to the
    row-fed form by merge-order invariance."""
    if k != 64:
        raise ValueError(f"k must be 64, got {k}")
    return _register(spark, f"dyadic_histw{k}", f"fes.DyadicHistW{k}")


def register_mg_topk(spark, k: int) -> str:
    """Idempotently register the Misra-Gries heavy-hitter summary
    ``mg_topk{k}`` (string key) -> array of 'key\\tcount' strings.
    Content is merge-order-DEPENDENT; only the guarantee/bound reads
    are deterministic (fes.MGTopK docstring)."""
    if k not in (8, 32):
        raise ValueError(f"k must be 8 or 32, got {k}")
    return _register(spark, f"mg_topk{k}", f"fes.MGTopK{k}")
