"""Filesystem helpers shared by maintenance and streaming operators.

Everything goes through the Hadoop FileSystem API so the same code works
on local disk and object stores (abfs/s3) alike — string-level path
tricks (os.path) break as soon as a scheme appears.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def dir_has_data(spark: SparkSession, path: str) -> bool:
    """True if ``path`` exists and contains at least one non-hidden entry."""
    fs, hpath = _fs_and_path(spark, path)
    if not fs.exists(hpath):
        return False
    for st in fs.listStatus(hpath):
        name = st.getPath().getName()
        if not name.startswith(".") and not name.startswith("_"):
            return True
    return False


def same_location(spark: SparkSession, a: str, b: str) -> bool:
    """True if two path strings resolve to the same physical location —
    scheme-aware ('file:///x' == '/x' on a local-FS default), unlike a
    string/os.path comparison."""
    fs_a, pa = _fs_and_path(spark, a)
    fs_b, pb = _fs_and_path(spark, b)
    qa = fs_a.makeQualified(pa)
    qb = fs_b.makeQualified(pb)
    return qa.toUri().equals(qb.toUri())
