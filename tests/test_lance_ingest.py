"""Lance dataset ingestion (sources/lance_ds.py + CdlFS.load_from_lance).

``lance`` is not installed here, so the Spark plumbing — fragment
planning on the driver, executor-side ``import lance`` + Arrow batch
streaming through ``mapInArrow``, schema mapping, rootfs re-registration
— runs against the deterministic fake in tests/fake_lance_module.py,
shipped to the Python workers with ``addPyFile``. A real-library
round-trip runs when lance IS importable (skipped otherwise), mirroring
the export-side gating in tests/test_optional_deps.py.
"""

from __future__ import annotations

import importlib.util
import os
import pathlib
import shutil
import sys

import pytest

from connected_data_lake_spark.sources.lance_ds import (
    is_lance_dataset,
    lance_dataset_version,
    read_lance,
)

HAS_LANCE = importlib.util.find_spec("lance") is not None

_FAKE_SRC = os.path.join(os.path.dirname(__file__), "fake_lance_module.py")


@pytest.fixture(scope="module")
def fake_lance(spark_module, tmp_path_factory):
    """Install the fake ``lance`` for driver AND executors (module-scoped:
    addPyFile registers a given file name once per context)."""
    if HAS_LANCE:  # real library present: don't shadow it
        yield None
        return
    mod_dir = tmp_path_factory.mktemp("fakelance")
    target = mod_dir / "lance.py"
    shutil.copy(_FAKE_SRC, target)
    sys.path.insert(0, str(mod_dir))
    sys.modules.pop("lance", None)
    spark_module.sparkContext.addPyFile(str(target))
    yield str(target)
    sys.path.remove(str(mod_dir))
    sys.modules.pop("lance", None)
    # addPyFile() also prepends the SparkFiles staging dir (which now holds
    # a copy of lance.py) to the driver's sys.path — strip it so later
    # tests in other modules can't accidentally import the fake.
    from pyspark import SparkFiles

    root = SparkFiles.getRootDirectory()
    sys.path[:] = [p for p in sys.path if not p.startswith(root)]


@pytest.fixture(scope="module")
def spark_module():
    from connected_data_lake_spark.session import get_spark

    return get_spark("lance-ingest-tests")


def _make_tree(root: pathlib.Path) -> dict[str, bytes]:
    files = {
        "empty.txt": b"",
        "small.txt": b"hello lance",
        "sub/big.bin": os.urandom(20_000),
    }
    for rel, data in files.items():
        full = root / rel
        full.parent.mkdir(parents=True, exist_ok=True)
        full.write_bytes(data)
    return files


def test_round_trip_to_lance_and_back(spark_module, fake_lance, tmp_path):
    """to_lance_dataset -> load_from_lance -> byte-equal restored tree,
    and the rootfs SQL surface agrees with the original table."""
    from connected_data_lake_spark import Cdl

    src = tmp_path / "src"
    files = _make_tree(src)
    cdl = Cdl(spark_module)
    fs = cdl.open(f"local://{src}")
    fs.load(max_chunk_size=4096)  # big.bin chunks -> multi-row files exist
    lance_path = str(tmp_path / "out.lance")
    fs.to_lance_dataset(lance_path)
    assert is_lance_dataset(lance_path)

    dst_ds = tmp_path / "migrated"
    dst_ds.mkdir()
    fs2 = cdl.open(f"local://{dst_ds}")
    fs2.load_from_lance(lance_path)
    # rootfs-parity query over the Lance-ingested tree
    a = fs.sql(
        "SELECT parent, name, COUNT(*) AS chunks, SUM(chunk_size) AS bytes "
        "FROM rootfs GROUP BY parent, name ORDER BY parent, name"
    ).collect()
    fs2._register()  # fs.sql above re-registered the view for fs
    b = fs2.sql(
        "SELECT parent, name, COUNT(*) AS chunks, SUM(chunk_size) AS bytes "
        "FROM rootfs GROUP BY parent, name ORDER BY parent, name"
    ).collect()
    assert a == b
    # full byte equality through chunk reassembly
    restored = tmp_path / "restored"
    fs2.copy_to(f"local://{restored}")
    for rel, data in files.items():
        assert (restored / rel).read_bytes() == data


def test_read_lance_columns_and_version(spark_module, fake_lance, tmp_path):
    import pyarrow as pa

    import lance

    uri = str(tmp_path / "ds.lance")
    t1 = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                   "s": pa.array(["a", "b", "c"], pa.string())})
    lance.write_dataset(t1, uri)
    t2 = pa.table({"id": pa.array([4], pa.int64()),
                   "s": pa.array(["d"], pa.string())})
    lance.write_dataset(t2, uri, mode="append")

    cur = read_lance(spark_module, uri)
    assert {r.id for r in cur.collect()} == {1, 2, 3, 4}
    v1 = read_lance(spark_module, uri, version=1)
    assert {r.id for r in v1.collect()} == {1, 2, 3}
    just_s = read_lance(spark_module, uri, columns=["s"])
    assert just_s.columns == ["s"]
    assert {r.s for r in just_s.collect()} == {"a", "b", "c", "d"}
    assert lance_dataset_version(uri) == 2


def test_fragment_parallel_plan_shape(spark_module, fake_lance, tmp_path):
    """The ingest plan is fragments -> mapInArrow: no collect-based scan,
    and the fragment relation repartitions to fragment count."""
    import pyarrow as pa

    import lance

    uri = str(tmp_path / "ds2.lance")
    lance.write_dataset(
        pa.table({"id": pa.array(list(range(10)), pa.int64())}), uri
    )
    df = read_lance(spark_module, uri)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in plan or "ArrowEvalPython" in plan or "MapInPandas" in plan
    assert df.count() == 10


def test_load_from_lance_rejects_non_rootfs(spark_module, fake_lance, tmp_path):
    import pyarrow as pa

    import lance

    from connected_data_lake_spark import Cdl

    uri = str(tmp_path / "notroot.lance")
    lance.write_dataset(pa.table({"x": pa.array([1], pa.int64())}), uri)
    ds_dir = tmp_path / "ds"
    ds_dir.mkdir()
    fs = Cdl(spark_module).open(f"local://{ds_dir}")
    with pytest.raises(ValueError, match="missing columns"):
        fs.load_from_lance(uri)


def test_is_lance_dataset_negative(tmp_path):
    assert not is_lance_dataset(str(tmp_path))
    (tmp_path / "data").mkdir()
    assert not is_lance_dataset(str(tmp_path))  # no .lance files, no _versions


def test_import_gate_without_lance(spark_module, monkeypatch, tmp_path):
    """With no ``lance`` importable at all, the ingest surface fails with
    the same usable NotImplementedError contract as the export side."""
    monkeypatch.setitem(sys.modules, "lance", None)
    with pytest.raises(NotImplementedError, match="lance is not available"):
        read_lance(spark_module, str(tmp_path))
    with pytest.raises(NotImplementedError):
        lance_dataset_version(str(tmp_path))


@pytest.mark.skipif(
    not HAS_LANCE,
    reason=(
        "lance not installed and not installable in this sandbox: "
        "`pip install lance` / `pip download pylance` attempted "
        "2026-08-15 (rounds 10 AND 12) both fail with DNS resolution "
        "errors ('Name or service not known' against the pypi mirror) — "
        "no network egress, so a committed real-bytes fixture cannot be "
        "produced here either (writing Lance v2 bytes requires the "
        "library). The plumbing is validated against "
        "tests/fake_lance_module.py; this test closes the gap the first "
        "time the real library is importable."
    ),
)
def test_real_lance_round_trip(spark_module, tmp_path):
    import pyarrow as pa

    import lance

    uri = str(tmp_path / "real.lance")
    lance.write_dataset(pa.table({"id": pa.array([1, 2], pa.int64())}), uri)
    got = read_lance(spark_module, uri)
    assert {r.id for r in got.collect()} == {1, 2}
