"""M0: pin the reference's JS validation semantics in the pure-Python oracle.

One test per quirk in FIXTURES.md §3 / SURVEY.md §2.2 (citations are into
/root/reference/validator_src/helpers/validationHelpers.js).
"""

from events_validator_spark.js_oracle import check_with_schema

RULES = {
    "event_name": {"type": "string", "value": "purchase"},
    "version": {"type": "number", "value": 1},
    "currency": {"type": "string"},
    "value": {"type": "number"},
    "promo_code": {"type": "string", "optional": True},
    "tracking_id": {"type": "string", "regex": "^trk_[0-9]{6}$"},
    "tags": {"type": "array", "length": 3},
    "items": {
        "type": "array",
        "nestedSchema": {
            "item_id": {"type": "string"},
            "price": {"type": "number"},
            "in_stock": {"type": "boolean"},
        },
    },
    "user_info": {"type": "object", "nestedSchema": {"user_id": {"type": "string"}}},
}

VALID = {
    "event_name": "purchase",
    "currency": "USD",
    "value": 9.99,
    "tracking_id": "trk_123456",
    "tags": ["a", "b", "c"],
    "items": [{"item_id": "i1", "price": 1.5, "in_stock": True}],
    "user_info": {"user_id": "u1"},
}


def v(event, rules=RULES):
    return check_with_schema(rules, event)


def test_valid_event_no_rows():
    assert v(VALID) == []


def test_missing_required_key():  # quirk 1 (js:142-145)
    e = dict(VALID); del e["currency"]
    assert ("currency", "missing", "field present", "field missing") in v(e)


def test_version_never_validated():  # quirk 2 (js:134)
    e = dict(VALID, version="totally wrong type")
    assert v(e) == []
    e2 = dict(VALID)  # absent version is also fine
    assert v(e2) == []


def test_optional_aliases():  # quirk 3 (js:12,140)
    rules = {"a": {"type": "string", "optional": True},
             "b": {"type": "string", "required": False}}
    assert v({}, rules) == []


def test_optional_empty_skip():  # quirk 4 (js:148-153)
    rules = {"a": {"type": "string", "optional": True, "regex": "x"}}
    for val in (None, "", "   "):
        assert v({"a": val}, rules) == []


def test_required_empty_string():  # quirk 5 (js:21-26)
    for val in ("", "   "):
        e = dict(VALID, currency=val)
        assert ("currency", "type", "non-empty string", "empty string") in v(e)


def test_typeof_null_is_object():  # quirk 6 (js:7,69-70)
    e = dict(VALID, value=None)
    assert ("value", "type", "number", "object") in v(e)
    rules = {"f": {"type": "boolean"}}
    assert v({"f": None}, rules) == [("f", "type", "boolean", "object")]


def test_scalar_in_nested_array_wrapped():  # quirk 7 (js:41-42)
    e = dict(VALID, items=["scalar"])
    rows = v(e)
    for key in ("item_id", "price", "in_stock"):
        assert (f"items[0].{key}", "missing", "field present", "field missing") in rows


def test_nested_paths_exact():  # quirk 8 (js:6,40,137)
    e = dict(VALID,
             items=[{"item_id": "a", "price": 1.0, "in_stock": True},
                    {"item_id": "b", "price": 2.0, "in_stock": False},
                    {"item_id": "c", "price": "x", "in_stock": True}],
             user_info={})
    rows = v(e)
    assert ("items[2].price", "type", "number", "string") in rows
    assert ("user_info.user_id", "missing", "field present", "field missing") in rows


def test_value_tostring_equality():  # quirk 9 (js:108)
    rules = {"n": {"value": 1}}
    assert v({"n": "1"}, rules) == []          # number 1 matches "1"
    assert v({"n": 1.0}, rules) == []          # 1.0 toString is '1'
    rules2 = {"arr": {"type": "array", "value": None}}
    rows = v({"arr": [1, 2]}, rules2)          # value:null vs array → spurious row
    assert ("arr", "value", None, "1,2") in rows


def test_regex_unanchored_and_empty():  # quirk 10 (js:120-125)
    rules = {"r": {"regex": "b+c"}}
    assert v({"r": "aaabbbcc"}, rules) == []   # unanchored search
    assert v({"r": ""}, rules) == [("r", "regex", "b+c", "empty_value")]
    assert v({"r": None}, rules) == [("r", "regex", "b+c", "empty_value")]
    assert v({"r": 123}, rules) == [("r", "regex", "b+c", "123")]
    rules2 = {"r": {"regex": "2"}}
    assert v({"r": 123}, rules2) == []         # non-string String()-coerced


def test_length_string_array_number():  # quirk 11 (js:76-85)
    rules = {"f": {"length": 3}}
    assert v({"f": "abc"}, rules) == []
    assert v({"f": [1, 2, 3]}, rules) == []
    assert v({"f": "ab"}, rules) == [("f", "length", "3", "2")]
    assert v({"f": 123}, rules) == [("f", "length", "3", None)]  # undefined length


def test_open_world_extra_fields_ignored():  # quirk 12 (js:133)
    e = dict(VALID, extra_field="whatever", another=123)
    assert v(e) == []


def test_string_check_reports_plain_typeof_for_arrays():  # js:17-18 vs js:7
    rules = {"s": {"type": "string"}}
    assert v({"s": [1]}, rules) == [("s", "type", "string", "object")]
    rules2 = {"s": {"type": "number"}}
    assert v({"s": [1]}, rules2) == [("s", "type", "number", "array")]


def test_object_type_check():  # js:53-67
    rules = {"o": {"type": "object"}}
    assert v({"o": None}, rules) == [("o", "type", "object", "object")]
    assert v({"o": [1]}, rules) == [("o", "type", "object", "array")]
    assert v({"o": 5}, rules) == [("o", "type", "object", "number")]
    assert v({"o": {}}, rules) == []


def test_independent_rule_dispatch():  # js:155-162
    rules = {"f": {"type": "string", "length": 2, "regex": "^zz"}}
    rows = v({"f": "abc"}, rules)
    assert ("f", "length", "2", "3") in rows
    assert ("f", "regex", "^zz", "abc") in rows
    assert len(rows) == 2


def test_enum_extension():
    rules = {"k": {"type": "string", "enum": ["text", "media"]}}
    assert v({"k": "text"}, rules) == []
    assert v({"k": "video"}, rules) == [("k", "enum", "text,media", "video")]


def test_length_null_coerces_to_empty():  # (v ?? []).length with null → 0
    rules = {"f": {"length": 0}}
    assert v({"f": None}, rules) == []
    rules3 = {"f": {"length": 3}}
    assert v({"f": None}, rules3) == [("f", "length", "3", "0")]
