"""Optional-dependency exports (S10 polars / S11 torch, reference
python/cdlake/filesystem.py:51-74): real smoke when the library is
installed, and — in environments without it — proof that the import gate
fails with the documented, actionable error instead of an obscure crash.
Either way every environment executes a meaningful assertion."""

from __future__ import annotations

import importlib.util
import pathlib

import pytest

from connected_data_lake_spark import Cdl

HAS_POLARS = importlib.util.find_spec("polars") is not None
HAS_TORCH = importlib.util.find_spec("torch") is not None
HAS_LANCE = importlib.util.find_spec("lance") is not None


@pytest.fixture()
def fs(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    pathlib.Path(src, "a.txt").write_bytes(b"alpha")
    pathlib.Path(src, "b.txt").write_bytes(b"beta")
    handle = Cdl(spark=spark).open(f"local://{src}")
    handle.load()
    return handle


@pytest.mark.skipif(not HAS_POLARS, reason="polars not installed")
def test_sql_as_polars_smoke(fs):
    out = fs.sql_as_polars("SELECT name, size FROM rootfs ORDER BY name")
    assert out.columns == ["name", "size"]
    assert out["name"].to_list() == ["a.txt", "b.txt"]


@pytest.mark.skipif(HAS_POLARS, reason="polars installed: gate not reachable")
def test_sql_as_polars_gate_error(fs):
    with pytest.raises(NotImplementedError, match="to_arrow"):
        fs.sql_as_polars("SELECT name FROM rootfs")


@pytest.mark.skipif(not HAS_TORCH, reason="torch not installed")
def test_to_torch_dataset_smoke(fs):
    ds = fs.to_torch_dataset(batch_size=1, columns=("name", "data"))
    items = [ds[i] for i in range(len(ds))]
    assert {bytes(it["data"][0]) for it in items} == {b"alpha", b"beta"}


@pytest.mark.skipif(HAS_TORCH, reason="torch installed: gate not reachable")
def test_to_torch_dataset_gate_error(fs):
    with pytest.raises(NotImplementedError, match="to_arrow"):
        fs.to_torch_dataset()


# -- success-path coverage WITHOUT the real libraries: minimal fakes expose
# the exact entry points the gated code touches, so the Arrow-side logic
# (column selection, row indexing, from_arrow handoff) runs in this sandbox.


@pytest.mark.skipif(HAS_POLARS, reason="real polars would shadow the fake")
def test_sql_as_polars_arrow_handoff(fs, monkeypatch):
    import sys
    import types

    captured = {}
    fake = types.ModuleType("polars")
    fake.from_arrow = lambda table: captured.setdefault("table", table)
    monkeypatch.setitem(sys.modules, "polars", fake)
    out = fs.sql_as_polars("SELECT name, size FROM rootfs ORDER BY name")
    assert out is captured["table"]
    assert out.column_names == ["name", "size"]
    assert out.column("name").to_pylist() == ["a.txt", "b.txt"]


@pytest.mark.skipif(HAS_TORCH, reason="real torch would shadow the fake")
def test_to_torch_dataset_indexing(fs, monkeypatch):
    import sys
    import types

    fake_torch = types.ModuleType("torch")
    fake_utils = types.ModuleType("torch.utils")
    fake_data = types.ModuleType("torch.utils.data")
    fake_data.Dataset = type("Dataset", (), {})
    fake_utils.data = fake_data
    fake_torch.utils = fake_utils
    for name, mod in (
        ("torch", fake_torch),
        ("torch.utils", fake_utils),
        ("torch.utils.data", fake_data),
    ):
        monkeypatch.setitem(sys.modules, name, mod)
    ds = fs.to_torch_dataset(columns=("name", "data"))
    assert len(ds) == 2
    rows = {ds[i]["name"]: bytes(ds[i]["data"]) for i in range(len(ds))}
    assert rows == {"a.txt": b"alpha", "b.txt": b"beta"}


@pytest.mark.skipif(not HAS_LANCE, reason="lance not installed")
def test_to_lance_dataset_smoke(fs, tmp_path):
    ds = fs.to_lance_dataset(str(tmp_path / "out.lance"))
    assert ds.count_rows() == 2


@pytest.mark.skipif(HAS_LANCE, reason="lance installed: gate not reachable")
def test_to_lance_dataset_gate_error(fs, tmp_path, monkeypatch):
    # Force the ImportError even if an earlier test (test_lance_ingest's
    # fake_lance fixture) left a fake ``lance`` importable via the
    # SparkFiles staging dir addPyFile() appends to sys.path: a None
    # entry in sys.modules makes ``import lance`` raise unconditionally.
    import sys

    monkeypatch.setitem(sys.modules, "lance", None)
    with pytest.raises(NotImplementedError, match="to_arrow"):
        fs.to_lance_dataset(str(tmp_path / "out.lance"))


@pytest.mark.skipif(HAS_LANCE, reason="real lance would shadow the fake")
def test_to_lance_dataset_arrow_handoff(fs, monkeypatch, tmp_path):
    import sys
    import types

    captured = {}
    fake = types.ModuleType("lance")

    def write_dataset(table, path, **kwargs):
        captured["table"], captured["path"], captured["kwargs"] = table, path, kwargs

    fake.write_dataset = write_dataset
    fake.dataset = lambda path: ("opened", path)
    monkeypatch.setitem(sys.modules, "lance", fake)
    out = fs.to_lance_dataset(
        str(tmp_path / "out.lance"),
        stmt="SELECT name, size FROM rootfs ORDER BY name",
        max_rows_per_file=7,
    )
    assert out == ("opened", str(tmp_path / "out.lance"))
    assert captured["path"] == str(tmp_path / "out.lance")
    assert captured["kwargs"] == {"max_rows_per_file": 7}
    assert captured["table"].column_names == ["name", "size"]
    assert captured["table"].column("name").to_pylist() == ["a.txt", "b.txt"]
