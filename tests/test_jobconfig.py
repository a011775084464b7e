"""Job-config validation parity goldens (reference error text verbatim)
+ wildcard case-semantics goldens (text vs keyword field paths)."""

from __future__ import annotations

import pytest

from elasticsearch_assets_spark.sources.jobconfig import (
    validate_reader_api_config,
    validate_reader_job,
)


# ---- reader API schema (elasticsearch_reader_api/schema.ts:255-302) ----
def test_subslice_requires_id_field():
    with pytest.raises(
        ValueError,
        match="If subslice_by_key is set to true, the id_field_name "
        "parameter of the documents must also be set",
    ):
        validate_reader_api_config({"subslice_by_key": True})
    # deprecated `field` alias satisfies it (schema.ts:261-265)
    validate_reader_api_config({"subslice_by_key": True, "field": "uuid"})
    validate_reader_api_config(
        {"subslice_by_key": True, "id_field_name": "uuid"}
    )


def test_slicers_bounded_by_key_range_length():
    with pytest.raises(
        ValueError,
        match="cannot be more the length of key_range",  # sic (reference text)
    ):
        validate_reader_api_config({"key_range": ["a", "b"]}, slicers=3)
    validate_reader_api_config({"key_range": ["a", "b", "c"]}, slicers=3)


@pytest.mark.parametrize(
    "key_type,bound", [("base64url", 64), ("hexadecimal", 16), ("HEXADECIMAL", 16)]
)
def test_slicers_bounded_by_keyspace_alphabet(key_type, bound):
    with pytest.raises(
        ValueError, match=f"cannot be more than {bound}"
    ):
        validate_reader_api_config({"key_type": key_type}, slicers=bound + 1)
    validate_reader_api_config({"key_type": key_type}, slicers=bound)


def test_plain_base64_is_unbounded():
    """schema.ts:292-301 bounds ONLY base64url + the hexadecimal pair;
    plain 'base64' passes the reference validator at any slicer count."""
    validate_reader_api_config({"key_type": "base64"}, slicers=65)
    validate_reader_api_config({"key_type": "base64"}, slicers=1000)


# ---- reader op schema (elasticsearch_reader/schema.ts:20-46) ----------
def test_date_field_name_required():
    with pytest.raises(
        ValueError,
        match="Invalid parameter date_field_name, must be of type string, "
        "was given null",
    ):
        validate_reader_job({"lifecycle": "once", "api": {}})


def test_persistent_mode_requires_manual_interval_and_delay():
    base = {"lifecycle": "persistent", "api": {"date_field_name": "created"}}
    with pytest.raises(
        ValueError,
        match="Invalid interval parameter, must be manually set while job "
        "is in persistent mode",
    ):
        validate_reader_job(base)
    with pytest.raises(
        ValueError,
        match="Invalid delay parameter, must be manually set while job "
        "is in persistent mode",
    ):
        validate_reader_job(
            {**base, "api": {**base["api"], "interval": "5m"}}
        )
    # fully specified persistent job passes
    validate_reader_job(
        {**base, "api": {**base["api"], "interval": "5m", "delay": "30s"}}
    )
    # 'once' lifecycle allows auto interval/delay
    validate_reader_job({"lifecycle": "once", "api": {"date_field_name": "created"}})


def test_job_level_validation_reaches_api_checks():
    with pytest.raises(ValueError, match="cannot be more than 16"):
        validate_reader_job(
            {
                "lifecycle": "once",
                "slicers": 17,
                "api": {"date_field_name": "created", "key_type": "hexadecimal"},
            }
        )


# ---- wildcard case semantics (VERDICT r2 next-round #8) ----------------
@pytest.fixture(scope="module")
def planner(corpus):
    from elasticsearch_assets_spark.query.planner import (
        PlannerConfig,
        QueryPlanner,
    )

    index, _ = corpus
    cfg = PlannerConfig(default_field="content", text_fields=("content",))
    return QueryPlanner(index, config=cfg)


def test_wildcard_text_field_is_case_insensitive(planner):
    """Text-path wildcards lowercase the pattern to match the
    lowercasing analyzer (ES: wildcard on an ANALYZED field matches
    analyzed terms): LOAD* ≡ load*."""
    from elasticsearch_assets_spark.query.parser import parse

    lower = {r["doc_id"] for r in planner.plan(parse("content:load*")).collect()}
    upper = {r["doc_id"] for r in planner.plan(parse("content:LOAD*")).collect()}
    assert lower and upper == lower


def test_wildcard_keyword_field_is_case_sensitive(planner):
    """Keyword-path wildcards are case-sensitive rlike (ES keyword
    semantics: no analysis, exact byte match modulo the glob)."""
    from elasticsearch_assets_spark.query.parser import parse

    exact = planner.plan(parse("path:src*")).count()
    wrong_case = planner.plan(parse("path:SRC*")).count()
    assert exact > 0
    assert wrong_case == 0
