"""Declarative dataset schemas — the reference's "Model" system, Spark-typed.

Reference parity (SURVEY.md §1.3): the reference's K8s control plane defines
models as typed field trees with constraints (reference
crates/cdl-openapi/src/model.rs:500-553 — field kinds; constraint checks in
crates/cdl-k8s-operator/src/validator/model.rs:382-449; JSON-Schema/CRD
import at validator/model.rs:149-293). That metadata never reaches its query
engine; here it becomes executable: a StructType builder, per-field
validation predicates usable as CHECK-style filters, and a JSON-Schema
importer.

Kind mapping (SURVEY §1.3 table):

==============  ==========================================================
model kind      Spark
==============  ==========================================================
Boolean         BooleanType
Integer         LongType (i64 in the reference, model.rs:844)
Number          DoubleType (OrderedFloat<f64>, model.rs:846)
String          StringType (+ length-range predicate)
OneOfStrings    StringType + membership predicate
DateTime        TimestampType
Ip / Uuid       StringType + format predicate
StringArray     ArrayType(StringType)
Object          StructType (static) — dynamic objects = MapType(STR,STR)
ObjectArray     ArrayType(StructType)
Model{name}     nested StructType composition (resolved at build time)
==============  ==========================================================
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_IP_RE = r"^((25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)$"
_UUID_RE = r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"


@dataclass
class ModelField:
    """One typed field. ``kind`` ∈ {boolean, integer, number, string,
    one_of_strings, datetime, ip, uuid, string_array, object,
    object_array, model}."""

    name: str
    kind: str
    nullable: bool = True
    default: object | None = None
    min: float | None = None
    max: float | None = None
    min_length: int | None = None
    max_length: int | None = None
    choices: tuple[str, ...] = ()
    children: tuple["ModelField", ...] = ()
    model: str | None = None  # for kind == "model": referenced model name
    dynamic: bool = False  # dynamic object → MapType (schema-on-read)

    def __post_init__(self) -> None:
        # model-build-time constraint validation (reference
        # validator/model.rs:382-449: min ≤ default ≤ max, enum membership)
        if self.min is not None and self.max is not None and self.min > self.max:
            raise ValueError(f"{self.name}: min > max")
        if self.default is not None:
            if self.min is not None and self.default < self.min:
                raise ValueError(f"{self.name}: default < min")
            if self.max is not None and self.default > self.max:
                raise ValueError(f"{self.name}: default > max")
            if self.choices and self.default not in self.choices:
                raise ValueError(f"{self.name}: default not in choices")


@dataclass
class Model:
    """A named field tree (reference ModelSpec::Fields; Dynamic = no
    fields + dynamic root)."""

    name: str
    fields: tuple[ModelField, ...] = ()
    registry: dict[str, "Model"] = field(default_factory=dict)

    def spark_schema(self) -> T.StructType:
        return T.StructType([self._field_struct(f) for f in self.fields])

    def _field_struct(self, f: ModelField) -> T.StructField:
        return T.StructField(f.name, self._field_type(f), f.nullable)

    def _field_type(self, f: ModelField) -> T.DataType:
        kind = f.kind
        if kind == "boolean":
            return T.BooleanType()
        if kind == "integer":
            return T.LongType()
        if kind == "number":
            return T.DoubleType()
        if kind in ("string", "one_of_strings", "ip", "uuid"):
            return T.StringType()
        if kind == "datetime":
            return T.TimestampType()
        if kind == "string_array":
            return T.ArrayType(T.StringType())
        if kind == "object":
            if f.dynamic:
                # schema-on-read dynamic object (reference Dynamic model,
                # validator/model.rs:35-42)
                return T.MapType(T.StringType(), T.StringType())
            return T.StructType([self._field_struct(c) for c in f.children])
        if kind == "object_array":
            return T.ArrayType(T.StructType([self._field_struct(c) for c in f.children]))
        if kind == "model":
            ref = self.registry.get(f.model or "")
            if ref is None:
                raise KeyError(f"{f.name}: unknown model reference {f.model!r}")
            # inline the referenced model's fields (reference field merger,
            # validator/model.rs:451-471)
            return ref.spark_schema()
        raise ValueError(f"{f.name}: unknown kind {kind!r}")

    # -- data-level validation (CHECK-style predicates) ---------------------

    def validators(self, prefix: str = "") -> dict[str, Column]:
        """Per-field boolean predicates; True = row conforms. NULLs pass
        unless the field is non-nullable (constraints apply to present
        values, as in the reference's parser,
        crates/cdl-k8s-provider/src/parser.rs:37-65)."""
        out: dict[str, Column] = {}
        for f in self.fields:
            col = F.col(prefix + f.name)
            checks: list[Column] = []
            if not f.nullable:
                checks.append(col.isNotNull())
            present = col.isNull()  # vacuously true for absent values
            if f.kind in ("integer", "number"):
                if f.min is not None:
                    checks.append(present | (col >= F.lit(f.min)))
                if f.max is not None:
                    checks.append(present | (col <= F.lit(f.max)))
            if f.kind == "string":
                if f.min_length is not None:
                    checks.append(present | (F.length(col) >= f.min_length))
                if f.max_length is not None:
                    checks.append(present | (F.length(col) <= f.max_length))
            if f.kind == "one_of_strings" and f.choices:
                checks.append(present | col.isin(list(f.choices)))
            if f.kind == "ip":
                checks.append(present | col.rlike(_IP_RE))
            if f.kind == "uuid":
                checks.append(present | col.rlike(_UUID_RE))
            if checks:
                pred = checks[0]
                for c in checks[1:]:
                    pred = pred & c
                out[prefix + f.name] = pred
        return out

    def conforms(self, df: DataFrame) -> DataFrame:
        """df + one boolean column per constrained field + `_conforms`."""
        preds = self.validators()
        out = df
        for name, pred in preds.items():
            out = out.withColumn(f"_ok_{name}", pred)
        ok = F.lit(True)
        for name in preds:
            ok = ok & F.col(f"_ok_{name}")
        return out.withColumn("_conforms", ok)

    def apply_defaults(self, df: DataFrame) -> DataFrame:
        """Fill NULLs with declared defaults (Delta column-default
        analogue)."""
        out = df
        for f in self.fields:
            if f.default is not None:
                out = out.withColumn(f.name, F.coalesce(F.col(f.name), F.lit(f.default)))
        return out


def from_json_schema(name: str, schema: dict) -> Model:
    """JSON-Schema (CRD OpenAPI) → Model (reference CRD import,
    validator/model.rs:149-293): object→children, array-of-object→
    object_array, string formats date-time|ip|uuid specialized; primitive
    arrays of strings supported, other primitive arrays unsupported (the
    reference warns and skips, :267)."""

    def conv(fname: str, node: dict, required_names: tuple = ()) -> ModelField | None:
        # required-ness resolves against the ENCLOSING object's `required`
        # list, not the root schema's: JSON Schema scopes `required` per
        # object node, so a nested child sharing a root-required name must
        # stay nullable and a nested object's own required list must bind.
        t = node.get("type")
        fmt = node.get("format", "")
        required = fname in required_names
        common = dict(nullable=not required, default=node.get("default"))
        if t == "boolean":
            return ModelField(fname, "boolean", **common)
        if t == "integer":
            return ModelField(
                fname, "integer", min=node.get("minimum"), max=node.get("maximum"), **common
            )
        if t == "number":
            return ModelField(
                fname, "number", min=node.get("minimum"), max=node.get("maximum"), **common
            )
        if t == "string":
            if "enum" in node:
                return ModelField(fname, "one_of_strings", choices=tuple(node["enum"]), **common)
            if fmt == "date-time":
                return ModelField(fname, "datetime", **common)
            if fmt in ("ip", "ipv4"):
                return ModelField(fname, "ip", **common)
            if fmt == "uuid":
                return ModelField(fname, "uuid", **common)
            return ModelField(
                fname,
                "string",
                min_length=node.get("minLength"),
                max_length=node.get("maxLength"),
                **common,
            )
        if t == "object":
            props = node.get("properties")
            if not props:
                return ModelField(fname, "object", dynamic=True, **common)
            sub_req = tuple(node.get("required", ()))
            children = tuple(
                c for k, v in props.items() if (c := conv(k, v, sub_req)) is not None
            )
            return ModelField(fname, "object", children=children, **common)
        if t == "array":
            items = node.get("items", {})
            if items.get("type") == "object":
                item_req = tuple(items.get("required", ()))
                children = tuple(
                    c
                    for k, v in items.get("properties", {}).items()
                    if (c := conv(k, v, item_req)) is not None
                )
                return ModelField(fname, "object_array", children=children, **common)
            if items.get("type") == "string":
                return ModelField(fname, "string_array", **common)
            return None  # primitive non-string arrays unsupported (warned)
        return None

    root_req = tuple(schema.get("required", ()))
    fields = tuple(
        c for k, v in schema.get("properties", {}).items() if (c := conv(k, v, root_req)) is not None
    )
    return Model(name, fields)
