"""spark-submit --py-files packaging (scripts/package_pyfiles.py): the
zip must be importable standalone (zipimport), contain no tests or
caches, and cover every angle_spark module."""

from __future__ import annotations

import subprocess
import sys
import zipfile


def test_zip_importable_and_complete(tmp_path):
    out = tmp_path / "angle_spark.zip"
    r = subprocess.run(
        [sys.executable, "/root/repo/scripts/package_pyfiles.py", "--out", str(out)],
        capture_output=True,
        text=True,
    )
    assert r.returncode == 0, r.stderr
    names = zipfile.ZipFile(out).namelist()
    assert "angle_spark/__init__.py" in names
    assert "angle_spark/query/wand.py" in names
    assert "angle_spark/index/build.py" in names
    assert not [n for n in names if "test" in n or "__pycache__" in n]
    # import from the zip in a CLEAN interpreter (executor simulation:
    # only the zip on sys.path, repo absent)
    probe = (
        f"import sys; sys.path.insert(0, {str(out)!r}); "
        "sys.path = [p for p in sys.path if p not in ('', '/root/repo')]; "
        "from angle_spark.functions.tokenizer import tokenize_py; "
        "from angle_spark.codec import K1; "
        "assert tokenize_py('A b!c') == ['a', 'b', 'c']; print('ok')"
    )
    r2 = subprocess.run(
        [sys.executable, "-c", probe], capture_output=True, text=True, cwd="/tmp"
    )
    assert r2.returncode == 0, r2.stderr
    assert r2.stdout.strip() == "ok"
