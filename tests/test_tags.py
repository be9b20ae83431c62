"""Truth tables for the messy OSM tag normalizers — semantics mirrored from
the reference ``clean`` / ``listify`` (p3_functions.py:1083-1162, 1188-1219),
including the documented quirks (SURVEY.md §7.6)."""

import numpy as np
import pandas as pd

from osmnetfusion_ray.functions.tags import clean, listify


class TestClean:
    def test_empty_and_nan(self):
        assert np.isnan(clean(""))
        assert np.isnan(clean(np.nan))
        assert np.isnan(clean(None))

    def test_scalar_passthrough(self):
        assert clean("asphalt") == "asphalt"
        assert clean(3) == 3
        assert clean(3, as_float=True) == 3.0

    def test_plain_numeric_string(self):
        # '5' -> '5' (kept as str without as_float), float with as_float
        assert clean("5") == "5"
        assert clean("5", as_float=True) == 5.0

    def test_inner_numeric_quirk(self):
        # reference quirk: a[1:-1].isnumeric() strips first+last char —
        # '300' -> '0' (p3_functions.py:1122-1123)
        assert clean("300") == "0"
        assert clean("300", as_float=True) == 0.0

    def test_semicolon_string_is_nan(self):
        # '1.35;3.6' fails float() -> NaN (p3_functions.py:1125-1128)
        assert np.isnan(clean("1.35;3.6", as_float=True))

    def test_list_string_parse(self):
        assert clean("['asphalt', 'gravel']") == ["asphalt", "gravel"]
        assert clean("['30', '50']", as_float=True) == [30.0, 50.0]

    def test_list_string_mixed_asfloat_drops_nonnumeric(self):
        assert clean("['30', 'x']", as_float=True) == 30.0  # single survivor collapses

    def test_single_element_collapse(self):
        assert clean("['asphalt']") == "asphalt"
        assert clean(["7"], as_float=True) == 7.0

    def test_keep_reductions(self):
        assert clean("['30', '50']", as_float=True, keep="max") == 50.0
        assert clean("['30', '50']", as_float=True, keep="min") == 30.0
        assert clean("['30', '50']", as_float=True, keep="mean") == 40.0

    def test_empty_list_is_nan(self):
        assert np.isnan(clean([]))
        assert np.isnan(clean("['x']", as_float=True))


class TestListify:
    def test_basic_unique_sorted(self):
        s = pd.Series(["b", "a", "b", ""])
        assert listify(s) == ["a", "b"]

    def test_comma_split_and_nonword_strip(self):
        # "['yes', 'no']" as a raw string: strip non-word chars -> 'yes,no'
        s = pd.Series(["['yes', 'no']", "maybe"])
        assert listify(s) == ["maybe", "no", "yes"]

    def test_numeric_string_strip_quirk(self):
        # '1.5' -> non-word '.' stripped -> '15' (documented quirk)
        s = pd.Series(["1.5"])
        assert listify(s) == ["15"]

    def test_as_int(self):
        s = pd.Series([3, 1, 2, 1])
        assert listify(s, as_int=True) == [1, 2, 3]

    def test_nan_and_empty_dropped(self):
        s = pd.Series(["", np.nan, "x"])
        assert listify(s) == ["x"]

    def test_lists_exploded(self):
        s = pd.Series([["a", "b"], ["b", "c"]])
        assert listify(s) == ["a", "b", "c"]

    def test_empty_result(self):
        assert listify(pd.Series(["", np.nan])) == []
