"""Job-config validation parity (SURVEY.md §2 "What's missing" #3).

Mirrors the reference's plan-time validators with the reference's
error message text, so misconfigured jobs fail before any Spark work:

- reader-API schema checks (asset/src/elasticsearch_reader_api/
  schema.ts:255-302): subslice_by_key requires id_field_name; slicer
  count bounded by key_range length and by the keyspace alphabet
  (64 for base64url, 16 for hexadecimal).
- reader op schema checks (asset/src/elasticsearch_reader/
  schema.ts:20-46): date_field_name required; persistent-lifecycle
  jobs must set interval and delay manually (no 'auto').

A "job" here is a plain dict of the same keys the reference's job/api
configs carry — the Spark engine has no Teraslice runtime, but the
validation surface (and its error text) is the compatibility contract.
"""

from __future__ import annotations

from typing import Any

# keyspace alphabet size bounds one slicer per leading character.
# NB: the reference bounds ONLY these three key types
# (schema.ts:292-301) — plain 'base64' is accepted at any slicer
# count there, so it is deliberately absent here for parity.
_KEY_TYPE_MAX_SLICERS = {
    "base64url": 64,
    "hexadecimal": 16,
    "HEXADECIMAL": 16,
}


def validate_reader_api_config(api: dict[str, Any], slicers: int = 1) -> None:
    """schema.ts:255-302 validateJob for the reader API config."""
    cfg = dict(api)
    if cfg.get("field"):
        # deprecated alias: field -> id_field_name (schema.ts:261-265)
        cfg.setdefault("id_field_name", cfg["field"])

    if cfg.get("subslice_by_key"):
        idf = cfg.get("id_field_name")
        if idf is None or not isinstance(idf, str) or len(idf) == 0:
            raise ValueError(
                "If subslice_by_key is set to true, the id_field_name "
                "parameter of the documents must also be set"
            )

    key_range = cfg.get("key_range")
    if key_range and slicers > len(key_range):
        raise ValueError(
            "The number of slicers specified on the job cannot be more "
            "the length of key_range"
        )

    bound = _KEY_TYPE_MAX_SLICERS.get(cfg.get("key_type", ""))
    if bound is not None and slicers > bound:
        raise ValueError(
            f"The number of slicers specified on the job cannot be more "
            f"than {bound}"
        )


def validate_geo_parameters(cfg: dict[str, Any]) -> None:
    """utils.ts:111-196 validateGeoParameters — reference error text
    verbatim. `cfg` carries the geo_* reader options."""
    top_left = cfg.get("geo_box_top_left")
    bottom_right = cfg.get("geo_box_bottom_right")
    point = cfg.get("geo_point")
    distance = cfg.get("geo_distance")
    sort_point = cfg.get("geo_sort_point")
    sort_order = cfg.get("geo_sort_order")
    sort_unit = cfg.get("geo_sort_unit")
    field = cfg.get("geo_field")

    if top_left and point:
        raise ValueError("geo_box and geo_distance queries can not be combined.")
    if (point and not distance) or (not point and distance):
        raise ValueError(
            "Both geo_point and geo_distance must be provided for a "
            "geo_point query."
        )
    if (top_left and not bottom_right) or (not top_left and bottom_right):
        raise ValueError(
            "Both geo_box_top_left and geo_box_bottom_right must be "
            "provided for a geo bounding box query."
        )
    if top_left and (sort_order or sort_unit) and not sort_point:
        raise ValueError(
            "bounding box search requires geo_sort_point to be set if "
            "any other geo_sort_* parameter is provided"
        )
    if (top_left or point or distance or sort_point) and not field:
        raise ValueError(
            "geo box search requires geo_field to be set if any other "
            "geo query parameters are provided"
        )
    is_box = bool(top_left and bottom_right)
    is_dist = bool(point and distance)
    if field and not (is_box or is_dist):
        raise ValueError(
            "if geo_field is specified then the appropriate geo_box or "
            "geo_distance query parameters need to be provided as well"
        )


def validate_reader_job(job: dict[str, Any]) -> None:
    """elasticsearch_reader/schema.ts:7-46 validateJob: date reader
    requirements + persistent-mode manual interval/delay."""
    api = job.get("api", {})

    if api.get("date_field_name") is None:
        given = type(job.get("date_field_name")).__name__
        if job.get("date_field_name") is None:
            given = "null"
        raise ValueError(
            f"Invalid parameter date_field_name, must be of type string, "
            f"was given {given}"
        )

    if job.get("lifecycle") == "persistent":
        if api.get("interval", "auto") == "auto":
            raise ValueError(
                "Invalid interval parameter, must be manually set while "
                "job is in persistent mode"
            )
        if api.get("delay", "auto") == "auto":
            raise ValueError(
                "Invalid delay parameter, must be manually set while "
                "job is in persistent mode"
            )

    validate_reader_api_config(api, slicers=int(job.get("slicers", 1)))
