"""Reference-parity tests for the normalization semantics, pinning the exact
behaviors of NormalizeJson (/root/reference/normalization.py:81-107) and
format_campaign_data (/root/reference/retrieval.py:104-113) per FIXTURES.md §B.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from build_pipeline_with_apache_beam_spark.operators.normalize import (
    BALANCE_LOG_KEYS,
    flatten_nested,
    normalize_balance_log,
    parse_json_array_lines,
    project_whitelist_cols,
)

FIXTURE_LINE = json.dumps([
    {"_id": "65f0a1b2c3d4e5f6a7b8c9d0", "accountId": "acc-1", "creatorId": "u-9",
     "creatorName": "Ana", "resourceName": "wallet",
     "resource": {"kind": "topup", "ids": [1, 2]},
     "type": "credit", "amount": 150.0, "before": 10.5, "after": 160.5,
     "notes": "", "executeAt": "2024-09-01 10:00:00",
     "createdAt": "2024-09-01 10:00:01", "extraField": "MUST BE DROPPED"},
    {"_id": "65f0d1", "accountId": "acc-2", "resource": {}, "amount": -3.0,
     "before": 3.0, "after": 0.0, "createdAt": "2024-09-01 10:05:00"},
    {"_id": "65f0d2", "accountId": "acc-3", "resource": [],
     "createdAt": "2024-09-01 10:06:00"},
])

RESOURCE_T = T.StructType([
    T.StructField("kind", T.StringType()),
    T.StructField("ids", T.ArrayType(T.LongType())),
])

ELEMENT_SCHEMA = T.StructType([
    T.StructField("_id", T.StringType()),
    T.StructField("accountId", T.StringType()),
    T.StructField("creatorId", T.StringType()),
    T.StructField("creatorName", T.StringType()),
    T.StructField("resourceName", T.StringType()),
    T.StructField("resource", RESOURCE_T),
    T.StructField("type", T.StringType()),
    T.StructField("amount", T.DoubleType()),
    T.StructField("before", T.DoubleType()),
    T.StructField("after", T.DoubleType()),
    T.StructField("notes", T.StringType()),
    T.StructField("executeAt", T.StringType()),
    T.StructField("createdAt", T.StringType()),
    T.StructField("extraField", T.StringType()),
])


def _lines_df(spark, lines):
    return spark.createDataFrame([(l,) for l in lines], "line string")


def test_line_as_array_explodes_to_records(spark):
    df = parse_json_array_lines(_lines_df(spark, [FIXTURE_LINE]), "line",
                                ELEMENT_SCHEMA)
    rows = df.collect()
    assert len(rows) == 3
    assert rows[0]["_id"] == "65f0a1b2c3d4e5f6a7b8c9d0"


def test_malformed_line_drops_silently(spark):
    df = parse_json_array_lines(_lines_df(spark, [FIXTURE_LINE, "not json"]),
                                "line", ELEMENT_SCHEMA)
    assert df.count() == 3  # bad line → null array → no rows (PERMISSIVE)


def test_whitelist_drops_extra_field(spark):
    df = parse_json_array_lines(_lines_df(spark, [FIXTURE_LINE]), "line",
                                ELEMENT_SCHEMA)
    out = project_whitelist_cols(df)
    assert set(out.columns) == set(BALANCE_LOG_KEYS)
    assert "extraField" not in out.columns


def test_parity_mode_renders_python_str(spark):
    """Non-empty dict → Python str() rendering: single quotes, not JSON
    (normalization.py:100)."""
    df = parse_json_array_lines(_lines_df(spark, [FIXTURE_LINE]), "line",
                                ELEMENT_SCHEMA)
    out = normalize_balance_log(df, mode="parity").orderBy("_id").collect()
    assert out[0]["resource"] == "{'kind': 'topup', 'ids': [1, 2]}"


def test_empty_dict_becomes_empty_string(spark):
    """resource: {} → '' (normalization.py:97-98).  A struct parsed from {}
    has all-null fields, which to_json renders as {} → ''."""
    df = parse_json_array_lines(_lines_df(spark, [FIXTURE_LINE]), "line",
                                ELEMENT_SCHEMA)
    out = {r["_id"]: r["resource"]
           for r in normalize_balance_log(df, mode="parity").collect()}
    assert out["65f0d1"] == ""


def test_empty_list_stringifies_not_empty():
    """The reference's asymmetry: [] → '[]' because the empty-check matches
    only {} (normalization.py:97,100).  Checked at the rendering level since
    a typed struct column cannot hold a bare list."""
    from build_pipeline_with_apache_beam_spark.operators import normalize as N

    # the pandas-UDF kernel's pure-python core
    import pandas as pd
    rendered = N._py_str_render.func(pd.Series(["[]", "{}", '{"a": 1}', None]))
    assert list(rendered) == ["[]", "", "{'a': 1}", None]


# --- property-based parity: the rendering kernel vs a model of the
# reference's exact rules (normalization.py:96-103) over arbitrary JSON ---

from hypothesis import given, settings
from hypothesis import strategies as st

_json_scalars = (st.none() | st.booleans()
                 | st.integers(min_value=-10**6, max_value=10**6)
                 | st.floats(allow_nan=False, allow_infinity=False)
                 | st.text(max_size=12))
_json_values = st.recursive(
    _json_scalars,
    lambda kids: (st.lists(kids, max_size=4)
                  | st.dictionaries(st.text(max_size=6), kids, max_size=4)),
    max_leaves=12)
_nested_values = (st.lists(_json_values, max_size=4)
                  | st.dictionaries(st.text(max_size=6), _json_values,
                                    max_size=4))


@settings(max_examples=200, deadline=None)
@given(_nested_values)
def test_parity_kernel_matches_reference_model(value):
    """For ANY nested JSON value the kernel must reproduce the reference:
    {} → '', everything else → Python str() of the parsed value — including
    the single-quote dict rendering and the []-is-not-empty asymmetry
    (normalization.py:97-100)."""
    import pandas as pd

    from build_pipeline_with_apache_beam_spark.operators import normalize as N

    rendered = N._py_str_render.func(pd.Series([json.dumps(value)]))[0]
    expected = "" if value == {} else str(value)
    assert rendered == expected


def test_idiomatic_mode_uses_compact_json(spark):
    df = parse_json_array_lines(_lines_df(spark, [FIXTURE_LINE]), "line",
                                ELEMENT_SCHEMA)
    out = {r["_id"]: r["resource"]
           for r in flatten_nested(project_whitelist_cols(df)).collect()}
    assert out["65f0a1b2c3d4e5f6a7b8c9d0"] == '{"kind":"topup","ids":[1,2]}'
    assert out["65f0d1"] == ""  # empty dict rule holds in idiomatic mode too


def test_missing_keys_stay_null(spark):
    df = parse_json_array_lines(_lines_df(spark, [FIXTURE_LINE]), "line",
                                ELEMENT_SCHEMA)
    out = {r["_id"]: r for r in normalize_balance_log(df).collect()}
    assert out["65f0d2"]["amount"] is None
    assert out["65f0d2"]["creatorName"] is None
