"""The north_rule deployment shape, end-to-end: ``spark-submit
--py-files codebased_spark.zip scripts/... `` with NO repo checkout on
the driver's path.

The scripts are copied to a bare temp dir (their repo-root
``sys.path`` fallback then points at an empty directory), so both the
driver and the executors can only import ``codebased_spark`` from the
zip — exactly the cluster contract (reference regime: an installed
console script, codebased README; ours: session.py module docstring).
The submitted search leg is then pinned score-identical to the same
index queried through the in-process library surface.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str | None:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return cand if os.path.exists(cand) else None


def test_make_pyfiles_zip_contents(tmp_path):
    from codebased_spark.session import make_pyfiles_zip

    out = make_pyfiles_zip(str(tmp_path / "pkg.zip"))
    names = zipfile.ZipFile(out).namelist()
    assert "codebased_spark/__init__.py" in names
    assert "codebased_spark/session.py" in names
    assert "codebased_spark/operators/query.py" in names
    assert not any("__pycache__" in n for n in names)
    assert all(n.endswith(".py") for n in names)
    # deterministic content order (same walk -> same namelist)
    out2 = make_pyfiles_zip(str(tmp_path / "pkg2.zip"))
    assert zipfile.ZipFile(out2).namelist() == names


@pytest.mark.skipif(_spark_submit() is None, reason="no spark-submit in PATH")
def test_spark_submit_pyfiles_build_and_search(spark, tmp_path):
    from codebased_spark.session import make_pyfiles_zip

    work = str(tmp_path / "submit")
    os.makedirs(work)
    for s in ("build_index.py", "search.py"):
        shutil.copy(os.path.join(REPO, "scripts", s), work)
    zip_path = make_pyfiles_zip(os.path.join(work, "codebased_spark.zip"))
    idx_dir = os.path.join(work, "idx")
    env = {**os.environ, "SPARK_GRAFT_CPUS": "2",
           "SPARK_GRAFT_DRIVER_MEM": "4g"}
    common = [_spark_submit(), "--master", "local[2]",
              "--py-files", zip_path]

    r = subprocess.run(
        common + [os.path.join(work, "build_index.py"),
                  "--synthetic", "200", "--index-dir", idx_dir,
                  "--num-blocks", "2"],
        cwd=work, env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert '"n_docs": 200' in r.stdout

    r = subprocess.run(
        common + [os.path.join(work, "search.py"), "--index-dir", idx_dir,
                  "--query", "hello world", "-k", "5", "--scores-only"],
        cwd=work, env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith(("+", "-"))]
    assert len(lines) == 5 and "# 5 results" in r.stdout

    # parity: the submitted process and the in-process library surface
    # score the same index identically (same formatting the CLI prints)
    from codebased_spark.plans.engine import FtsIndex

    rows = FtsIndex(spark, idx_dir).search("hello world", 5).collect()
    expect = [f"{r['score']:+.9f}  nm={int(r['name_match'])}  doc={r['doc_id']}"
              for r in rows]
    assert lines == expect
