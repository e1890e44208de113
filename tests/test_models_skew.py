"""Model schema system (SURVEY §1.3 / C1) and skew-join helpers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from connected_data_lake_spark.models import Model, ModelField, from_json_schema
from connected_data_lake_spark.operators.skew import salted_join, top_keys

SENSOR = Model(
    "sensor",
    (
        ModelField("id", "uuid", nullable=False),
        ModelField("host", "ip"),
        ModelField("status", "one_of_strings", choices=("ok", "warn", "crit")),
        ModelField("temp", "number", min=-40.0, max=125.0, default=20.0),
        ModelField("label", "string", min_length=1, max_length=8),
        ModelField("tags", "string_array"),
        ModelField(
            "meta",
            "object",
            children=(ModelField("fw", "string"), ModelField("rev", "integer")),
        ),
    ),
)


def test_spark_schema_mapping():
    s = SENSOR.spark_schema()
    assert s["id"].dataType == T.StringType() and not s["id"].nullable
    assert s["temp"].dataType == T.DoubleType()
    assert s["tags"].dataType == T.ArrayType(T.StringType())
    assert isinstance(s["meta"].dataType, T.StructType)
    assert s["meta"].dataType["rev"].dataType == T.LongType()


def test_dynamic_object_and_model_ref():
    reg = {"sensor": SENSOR}
    m = Model(
        "rack",
        (
            ModelField("name", "string"),
            ModelField("extra", "object", dynamic=True),
            ModelField("primary", "model", model="sensor"),
        ),
        registry=reg,
    )
    s = m.spark_schema()
    assert s["extra"].dataType == T.MapType(T.StringType(), T.StringType())
    assert isinstance(s["primary"].dataType, T.StructType)  # inlined reference
    with pytest.raises(KeyError):
        Model("bad", (ModelField("x", "model", model="nope"),)).spark_schema()


def test_build_time_constraint_validation():
    with pytest.raises(ValueError):
        ModelField("x", "integer", min=10, max=5)
    with pytest.raises(ValueError):
        ModelField("x", "integer", min=0, max=5, default=9)
    with pytest.raises(ValueError):
        ModelField("x", "one_of_strings", choices=("a",), default="b")


def test_data_level_validation_and_defaults(spark):
    rows = [
        ("123e4567-e89b-42d3-a456-426614174000", "10.0.0.1", "ok", 21.5, "n1"),
        ("not-a-uuid", "999.1.1.1", "bad", 300.0, ""),
        ("123e4567-e89b-42d3-a456-426614174001", None, None, None, "n3"),
    ]
    df = spark.createDataFrame(rows, "id string, host string, status string, temp double, label string")
    out = Model("sensor", SENSOR.fields[:5]).conforms(df).collect()
    by_id = {r["id"]: r for r in out}
    assert by_id["123e4567-e89b-42d3-a456-426614174000"]["_conforms"]
    bad = by_id["not-a-uuid"]
    assert not bad["_conforms"]
    assert not bad["_ok_id"] and not bad["_ok_host"] and not bad["_ok_status"]
    assert not bad["_ok_temp"] and not bad["_ok_label"]
    # NULLs pass value constraints (nullable fields)
    assert by_id["123e4567-e89b-42d3-a456-426614174001"]["_conforms"]

    filled = Model("sensor", SENSOR.fields[:5]).apply_defaults(df)
    r3 = filled.filter(F.col("id").endswith("4001")).first()
    assert r3["temp"] == 20.0


def test_from_json_schema_crd_import():
    schema = {
        "type": "object",
        "required": ["name"],
        "properties": {
            "name": {"type": "string", "minLength": 1},
            "created": {"type": "string", "format": "date-time"},
            "addr": {"type": "string", "format": "ip"},
            "uid": {"type": "string", "format": "uuid"},
            "mode": {"type": "string", "enum": ["a", "b"]},
            "count": {"type": "integer", "minimum": 0, "maximum": 10},
            "ratio": {"type": "number"},
            "flags": {"type": "array", "items": {"type": "string"}},
            "bad_array": {"type": "array", "items": {"type": "integer"}},
            "nested": {
                "type": "object",
                "properties": {"k": {"type": "string"}},
            },
            "items_obj": {
                "type": "array",
                "items": {"type": "object", "properties": {"v": {"type": "number"}}},
            },
            "anything": {"type": "object"},
        },
    }
    m = from_json_schema("crd", schema)
    kinds = {f.name: f.kind for f in m.fields}
    assert kinds == {
        "name": "string",
        "created": "datetime",
        "addr": "ip",
        "uid": "uuid",
        "mode": "one_of_strings",
        "count": "integer",
        "ratio": "number",
        "flags": "string_array",
        "nested": "object",
        "items_obj": "object_array",
        "anything": "object",
    }  # bad_array (primitive non-string items) dropped, as the reference warns
    name = next(f for f in m.fields if f.name == "name")
    assert not name.nullable and name.min_length == 1
    anything = next(f for f in m.fields if f.name == "anything")
    assert anything.dynamic
    # schema builds and count constraints carried
    st = m.spark_schema()
    assert isinstance(st, T.StructType)


def test_from_json_schema_nested_required_scoping():
    """`required` binds per object node: a nested child named like a
    root-required property stays nullable, and a nested object's own
    required list makes its child non-nullable."""
    schema = {
        "type": "object",
        "required": ["name"],
        "properties": {
            "name": {"type": "string"},
            "nested": {
                "type": "object",
                "required": ["inner"],
                "properties": {
                    # same name as a ROOT-required property: must stay nullable
                    "name": {"type": "string"},
                    "inner": {"type": "integer"},
                },
            },
            "arr": {
                "type": "array",
                "items": {
                    "type": "object",
                    "required": ["v"],
                    "properties": {"v": {"type": "number"}, "w": {"type": "number"}},
                },
            },
        },
    }
    m = from_json_schema("crd", schema)
    fields = {f.name: f for f in m.fields}
    assert not fields["name"].nullable  # root required
    nested = {c.name: c for c in fields["nested"].children}
    assert nested["name"].nullable  # NOT root-required here
    assert not nested["inner"].nullable  # nested object's own required
    arr = {c.name: c for c in fields["arr"].children}
    assert not arr["v"].nullable and arr["w"].nullable


def test_salted_join_matches_plain_join(spark):
    # hot key: 90% of the large side is key 1
    large = spark.range(0, 10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.createDataFrame([(k, f"dim{k}") for k in range(100)], "k int, name string")
    plain = large.join(small, ["k"], "inner")
    salted = salted_join(large, small, ["k"], buckets=8)
    assert salted.count() == plain.count()
    assert salted.groupBy().sum("v").first()[0] == plain.groupBy().sum("v").first()[0]

    left = salted_join(large, small.filter("k < 50"), ["k"], buckets=4, how="left")
    assert left.count() == large.count()
    with pytest.raises(ValueError):
        salted_join(large, small, ["k"], how="full")


def test_top_keys_probe(spark):
    df = spark.createDataFrame([(1,), (1,), (1,), (2,), (3,)], "k int")
    rows = top_keys(df, ["k"], n=2).collect()
    assert rows[0]["k"] == 1 and rows[0]["count"] == 3
    assert len(rows) == 2
