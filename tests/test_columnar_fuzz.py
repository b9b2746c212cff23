"""Randomized columnar ≡ rowcheck differential: seeded random schemas
over the documents table; for every row the columnar plan's verdict and
first-violation rule must equal the row validator's (which is itself
pinned to the reference by tests/test_rowcheck_differential.py and the
hypothesis fuzzers — so transitively columnar ≡ reference)."""

import random

import pytest
from pyspark.sql import functions as F

import spark_schema_guard as ssg

COLUMNS = ["doc_id", "text", "lang", "source", "n_chars"]


def _random_property_schema(rng: random.Random, column: str) -> dict:
    numeric = column in ("doc_id", "n_chars")
    choices: list[dict] = []
    if numeric:
        choices += [
            {"minimum": rng.randint(-5, 400)},
            {"maximum": rng.randint(-5, 400)},
            {"exclusiveMinimum": rng.randint(-5, 400)},
            {"exclusiveMaximum": rng.randint(-5, 400)},
            {"multipleOf": rng.choice([2, 3, 7])},
            {"type": rng.choice(["integer", "number", "string"])},
            {"enum": [rng.randint(0, 50) for _ in range(3)]},
        ]
    else:
        choices += [
            {"minLength": rng.randint(0, 200)},
            {"maxLength": rng.randint(0, 200)},
            {"pattern": rng.choice(["^src", "[0-9]$", "a.c", "^(en|de)$"])},
            {"type": rng.choice(["string", "integer"])},
            {"enum": rng.sample(["en", "de", "fr", "es", "src1", "zz"], 3)},
            {"format": rng.choice(["email", "hostname", "unknown"])},
        ]
    schema: dict = {}
    for _ in range(rng.randint(1, 2)):
        schema.update(rng.choice(choices))
    # wrap some in combinators
    wrap = rng.random()
    if wrap < 0.15:
        return {"not": schema}
    if wrap < 0.3:
        other = dict(rng.choice(choices))
        return {"anyOf": [schema, other]}
    if wrap < 0.4:
        other = dict(rng.choice(choices))
        return {"oneOf": [schema, other]}
    if wrap < 0.5:
        other = dict(rng.choice(choices))
        return {"allOf": [schema, other]}
    return schema


def _random_schema(rng: random.Random) -> dict:
    props = {
        c: _random_property_schema(rng, c)
        for c in rng.sample(COLUMNS, rng.randint(1, 3))
    }
    schema: dict = {"type": "object", "properties": props}
    if rng.random() < 0.5:
        schema["required"] = rng.sample(sorted(props), 1)
    if rng.random() < 0.2:
        schema["if"] = {"properties": {"lang": {"enum": ["en"]}}}
        schema["then"] = {"required": [rng.choice(COLUMNS)]}
    return schema


@pytest.mark.parametrize("seed", range(8))
def test_columnar_matches_rowcheck_random_schemas(spark, sf_dir, seed):
    rng = random.Random(20260817 + seed)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = [r.asDict() for r in docs.collect()]

    for _ in range(8):
        schema = _random_schema(rng)
        try:
            plan = ssg.compile_plan(schema, docs.schema)
            validator = ssg.compile(schema, fast_fail=False)
        except ssg.SchemaDefinitionError:
            continue
        got = {
            r["doc_id"]: (r["verdict"], r["first_rule"])
            for r in plan.apply(docs).select(
                "doc_id", "verdict",
                F.try_element_at("violations", F.lit(1)).getField("rule")
                .alias("first_rule")).collect()
        }
        for row in rows:
            data = {k: v for k, v in row.items() if v is not None}
            errors = validator.collect(data)
            want = (not errors, errors[0].rule if errors else None)
            assert got[row["doc_id"]] == want, (
                f"seed={seed} schema={schema!r} doc={row!r} "
                f"columnar={got[row['doc_id']]} rowcheck={want}")
