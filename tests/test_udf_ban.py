"""The zero-UDF line, enforced: row-at-a-time Python UDFs are banned
from the package, and every Arrow-batched Python data path must be one
of the explicitly allowed, documented sites.  A new operator that
reaches for Python in the hot path fails THIS test before it fails a
benchmark."""
from __future__ import annotations

import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parent.parent / "etl_addresses_spark"

# the only sanctioned Arrow-batched Python data paths:
#   - multimodal.py: the PNG codec (binary payloads have no JVM expression)
#   - event_stream.py: applyInPandasWithState (the arbitrary-state API)
ALLOWED_PANDAS_FILES = {"multimodal.py", "event_stream.py"}

ROW_UDF_PATTERNS = [
    re.compile(r"\bF\.udf\("),
    re.compile(r"^\s*@udf", re.MULTILINE),
    re.compile(r"\bpandas_udf\("),
    re.compile(r"\bspark\.udf\.register"),
    re.compile(r"\bmapPartitions\("),
    re.compile(r"\.rdd\b"),
]

PANDAS_API_PATTERN = re.compile(r"\.(mapInPandas|applyInPandas(WithState)?)\(")


# ckpt.py's `plan.rdd()` is a py4j accessor on the JVM LogicalRDD —
# a storage-management handle used only to unpersist checkpoint blocks
# (no row ever crosses into Python).  The ban targets DataFrame.rdd
# data paths; the exemption is pinned to that EXACT accessor spelling
# and a fixed occurrence count, so a future `df.rdd` data path added
# to ckpt.py still trips the ban (r6 advice — don't exempt the file).
SANCTIONED_RDD_ACCESSOR = ("ckpt.py", re.compile(r"\bplan\.rdd\(\)"), 1)


def test_no_row_at_a_time_python_udfs():
    offenders = []
    for path in PKG.rglob("*.py"):
        src = path.read_text()
        for pat in ROW_UDF_PATTERNS:
            hits = pat.findall(src)
            if not hits:
                continue
            if pat.pattern == r"\.rdd\b":
                fname, accessor, allowed_n = SANCTIONED_RDD_ACCESSOR
                if (
                    path.name == fname
                    and len(hits) == allowed_n
                    and len(accessor.findall(src)) == allowed_n
                ):
                    continue
            offenders.append(f"{path.name}: {pat.pattern}")
    assert not offenders, f"banned Python data-path constructs: {offenders}"


def test_pandas_paths_only_in_sanctioned_files():
    offenders = []
    for path in PKG.rglob("*.py"):
        if PANDAS_API_PATTERN.search(path.read_text()):
            if path.name not in ALLOWED_PANDAS_FILES:
                offenders.append(path.name)
    assert not offenders, (
        f"new Arrow/pandas data path in {offenders}; either express it in "
        "JVM column expressions or add it here WITH a documented reason"
    )
