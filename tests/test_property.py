"""Property substrate tests — semantics modeled on the reference's own
suite (reference ``test/property/``: layer, stack, carousel, filter,
validator, readonly, deletion)."""

import pytest

from openwebrx_tpu.core.property import (
    DELETED, PropertyCarousel, PropertyError, PropertyFilter, PropertyLayer,
    PropertyStack, ValidatingProperties, ValidationError,
)


class TestLayer:
    def test_get_set_contains_delete(self):
        p = PropertyLayer(a=1)
        assert "a" in p and p["a"] == 1
        p["b"] = 2
        assert p.to_dict() == {"a": 1, "b": 2}
        del p["a"]
        assert "a" not in p

    def test_subscription_fires(self):
        p = PropertyLayer()
        seen = []
        p.subscribe(seen.append, "x")
        p["x"] = 5
        assert seen == [5]

    def test_no_fire_on_same_value(self):
        p = PropertyLayer(x=5)
        seen = []
        p.subscribe(seen.append, "x")  # initial fire: [5]
        p["x"] = 5
        assert seen == [5]

    def test_keyed_subscription_initial_fire(self):
        p = PropertyLayer(x=7)
        seen = []
        p.subscribe(seen.append, "x")
        assert seen == [7]

    def test_wildcard_subscription_gets_changes_dict(self):
        p = PropertyLayer()
        seen = []
        p.subscribe(seen.append)
        p["a"] = 1
        assert seen == [{"a": 1}]

    def test_deletion_event(self):
        p = PropertyLayer(a=1)
        seen = []
        p.subscribe(seen.append)
        del p["a"]
        assert seen == [{"a": DELETED}]

    def test_cancel(self):
        p = PropertyLayer()
        seen = []
        sub = p.subscribe(seen.append)
        sub.cancel()
        p["a"] = 1
        assert seen == []


class TestStack:
    def test_priority_resolution(self):
        s = PropertyStack()
        s.add_layer(1, PropertyLayer(x="low", y="low"))
        s.add_layer(0, PropertyLayer(x="high"))
        assert s["x"] == "high"
        assert s["y"] == "low"

    def test_add_layer_fires_only_visible(self):
        s = PropertyStack()
        s.add_layer(0, PropertyLayer(x="top"))
        seen = []
        s.subscribe(seen.append)
        s.add_layer(1, PropertyLayer(x="hidden", y="new"))
        assert seen == [{"y": "new"}]

    def test_remove_layer_reveals_lower(self):
        s = PropertyStack()
        hi = PropertyLayer(x="high")
        s.add_layer(0, hi)
        s.add_layer(1, PropertyLayer(x="low"))
        seen = []
        s.subscribe(seen.append)
        s.remove_layer(hi)
        assert seen == [{"x": "low"}]

    def test_remove_last_layer_deletes(self):
        s = PropertyStack()
        lyr = PropertyLayer(x=1)
        s.add_layer(0, lyr)
        seen = []
        s.subscribe(seen.append)
        s.remove_layer(lyr)
        assert seen == [{"x": DELETED}]

    def test_replace_layer_net_diff(self):
        s = PropertyStack()
        s.add_layer(1, PropertyLayer(a=1, b=2, c=3))
        seen = []
        s.subscribe(seen.append)
        s.replace_layer(1, PropertyLayer(a=1, b=20, d=4))
        assert seen == [{"b": 20, "c": DELETED, "d": 4}]

    def test_write_goes_to_owning_layer(self):
        s = PropertyStack()
        low = PropertyLayer(x=1)
        s.add_layer(1, low)
        s.add_layer(0, PropertyLayer(y=0))
        s["x"] = 2
        assert low["x"] == 2

    def test_layer_change_fires_when_visible(self):
        s = PropertyStack()
        top = PropertyLayer(x=1)
        s.add_layer(0, top)
        s.add_layer(1, PropertyLayer(x=99))
        seen = []
        s.subscribe(seen.append)
        top["x"] = 2
        assert seen == [{"x": 2}]

    def test_hidden_layer_change_does_not_fire(self):
        s = PropertyStack()
        low = PropertyLayer(x=1)
        s.add_layer(0, PropertyLayer(x="top"))
        s.add_layer(1, low)
        seen = []
        s.subscribe(seen.append)
        low["x"] = 2
        assert seen == []

    def test_deletion_reveals_lower_value(self):
        s = PropertyStack()
        top = PropertyLayer(x="top")
        s.add_layer(0, top)
        s.add_layer(1, PropertyLayer(x="low"))
        seen = []
        s.subscribe(seen.append)
        del top["x"]
        assert seen == [{"x": "low"}]

    def test_deletion_gone_everywhere(self):
        s = PropertyStack()
        top = PropertyLayer(x="top")
        s.add_layer(0, top)
        s.add_layer(1, PropertyLayer(y=1))
        seen = []
        s.subscribe(seen.append)
        del top["x"]
        assert seen == [{"x": DELETED}]


class TestCarousel:
    def test_switch_fires_diff(self):
        c = PropertyCarousel()
        c.add_layer("p1", PropertyLayer(f=100, m="nfm"))
        c.add_layer("p2", PropertyLayer(f=200, m="nfm"))
        c.switch("p1")
        seen = []
        c.subscribe(seen.append)
        c.switch("p2")
        assert seen == [{"f": 200}]

    def test_switch_deletes_missing(self):
        c = PropertyCarousel()
        c.add_layer("p1", PropertyLayer(f=100, extra=1))
        c.add_layer("p2", PropertyLayer(f=100))
        c.switch("p1")
        seen = []
        c.subscribe(seen.append)
        c.switch("p2")
        assert seen == [{"extra": DELETED}]

    def test_active_layer_passthrough(self):
        c = PropertyCarousel()
        c.add_layer("p", PropertyLayer(x=1))
        c.switch("p")
        assert c["x"] == 1
        seen = []
        c.subscribe(seen.append, "x")
        c["x"] = 5
        assert 5 in seen

    def test_replace_active_layer_switches(self):
        c = PropertyCarousel()
        lyr = PropertyLayer(x=1)
        c.add_layer("p", lyr)
        c.switch("p")
        seen = []
        c.subscribe(seen.append)
        c.add_layer("p", PropertyLayer(x=2))
        assert seen == [{"x": 2}]


class TestFilterValidatorReadonly:
    def test_filter_restricts_keys(self):
        p = PropertyLayer(a=1, b=2)
        f = p.filtered("a")
        assert "a" in f and "b" not in f
        assert list(f.keys()) == ["a"]
        with pytest.raises(KeyError):
            f["b"]
        with pytest.raises(KeyError):
            f["b"] = 1

    def test_filter_forwards_only_matching_events(self):
        p = PropertyLayer()
        f = p.filtered("a")
        seen = []
        f.subscribe(seen.append)
        p["a"] = 1
        p["b"] = 2
        assert seen == [{"a": 1}]

    def test_filter_writes_through(self):
        p = PropertyLayer()
        f = p.filtered("a")
        f["a"] = 3
        assert p["a"] == 3

    def test_validator_accepts_and_rejects(self):
        p = PropertyLayer()
        v = ValidatingProperties(p, {"n": "int", "s": "str"})
        v["n"] = 5
        with pytest.raises(ValidationError):
            v["n"] = "no"
        with pytest.raises(ValidationError):
            v["s"] = 1
        assert p["n"] == 5

    def test_validator_lambda_and_regex(self):
        p = PropertyLayer()
        v = ValidatingProperties(p, {"even": lambda x: x % 2 == 0,
                                     "call": "regex:^[A-Z0-9]+$"})
        v["even"] = 4
        v["call"] = "DL1ABC"
        with pytest.raises(ValidationError):
            v["even"] = 3
        with pytest.raises(ValidationError):
            v["call"] = "lowercase"

    def test_readonly_blocks_writes(self):
        p = PropertyLayer(x=1)
        r = p.readonly()
        assert r["x"] == 1
        with pytest.raises(PropertyError):
            r["x"] = 2
        with pytest.raises(PropertyError):
            del r["x"]

    def test_readonly_forwards_events(self):
        p = PropertyLayer()
        r = p.readonly()
        seen = []
        r.subscribe(seen.append, "x")
        p["x"] = 1
        assert seen == [1]
