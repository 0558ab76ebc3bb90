"""The checked-in spark-submit artifact must match the source tree.

ADVICE r3: dist/extractor_spark.zip drifted from HEAD (missing the
hot_keys registration and warmup(schema=)), so a spark-submit using the
committed artifact silently ran older code.  This gate diffs every zip
member against the tree byte-for-byte and lists missing/extra members;
on failure the fix is one command: sh scripts/make_pyfiles_zip.sh.
"""

import pathlib
import zipfile

REPO = pathlib.Path(__file__).resolve().parent.parent
ZIP = REPO / "dist" / "extractor_spark.zip"


def test_pyfiles_zip_matches_source_tree():
    assert ZIP.exists(), "dist/extractor_spark.zip missing — run scripts/make_pyfiles_zip.sh"
    src = {
        p.relative_to(REPO).as_posix(): p.read_bytes()
        for p in (REPO / "extractor_spark").rglob("*.py")
    }
    with zipfile.ZipFile(ZIP) as zf:
        members = {n: zf.read(n) for n in zf.namelist() if not n.endswith("/")}
    missing = sorted(set(src) - set(members))
    extra = sorted(set(members) - set(src))
    stale = sorted(n for n in set(src) & set(members) if src[n] != members[n])
    assert not (missing or extra or stale), (
        f"py-files zip out of date (run scripts/make_pyfiles_zip.sh): "
        f"missing={missing} extra={extra} stale={stale}"
    )
