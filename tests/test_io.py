"""HDF5 I/O tests: round-trips, schema tree, backend façade."""

import numpy as np
import pytest

from ska_sdp_tpu.io import h5, schema
from ska_sdp_tpu.io import h5py_backend as hb


class TestRoundTrip:
    def test_double_roundtrip(self, tmp_path, rng):
        p = str(tmp_path / "t1.h5")
        a = rng.standard_normal((4, 5, 6))
        hb.create_file(p)
        hb.write_dataset(p, "/x/y", a)
        np.testing.assert_array_equal(hb.read_dataset(p, "/x/y"), a)

    def test_complex_roundtrip(self, tmp_path, rng):
        p = str(tmp_path / "t2.h5")
        a = (rng.standard_normal((3, 3)) + 1j * rng.standard_normal((3, 3)))
        hb.create_file(p)
        hb.write_dataset(p, "/c", a)
        np.testing.assert_array_equal(hb.read_dataset(p, "/c"), a)

    def test_int64_roundtrip(self, tmp_path, rng):
        p = str(tmp_path / "t3.h5")
        a = rng.integers(-(2**40), 2**40, size=17)
        hb.create_file(p)
        hb.write_dataset(p, "/i", a)
        np.testing.assert_array_equal(hb.read_dataset(p, "/i"), a)

    def test_rank4_roundtrip(self, tmp_path, rng):
        p = str(tmp_path / "t4.h5")
        a = rng.standard_normal((2, 3, 4, 5)) * (1 + 1j)
        hb.create_file(p)
        hb.write_dataset(p, "/k", a)
        np.testing.assert_array_equal(hb.read_dataset(p, "/k"), a)

    def test_stacked_read(self, tmp_path, rng):
        p = str(tmp_path / "t5.h5")
        hb.create_file(p)
        arrs = [rng.standard_normal((4, 4)) * (1 + 0j) for _ in range(3)]
        for k, a in enumerate(arrs):
            hb.write_dataset(p, f"/g/{k}/kern", a)
        got = hb.read_datasets_stacked(p, [f"/g/{k}/kern" for k in range(3)])
        np.testing.assert_array_equal(got, np.stack(arrs))

    def test_list_group_and_ext_default(self, tmp_path):
        p = str(tmp_path / "t6")  # no .h5 — backend appends it
        hb.create_file(p)
        hb.write_dataset(p, "/w/100.0/kern", np.zeros((2, 2)))
        hb.write_dataset(p, "/w/-50.5/kern", np.zeros((2, 2)))
        members = hb.list_group(p, "/w")
        assert sorted(members) == sorted(["100.0", "-50.5"])

    def test_overwrite_dataset(self, tmp_path):
        p = str(tmp_path / "t7.h5")
        hb.create_file(p)
        hb.write_dataset(p, "/d", np.ones(3))
        hb.write_dataset(p, "/d", np.zeros(4))
        assert hb.read_dataset(p, "/d").shape == (4,)


class TestSchema:
    def test_parse_sorted_numeric(self):
        pairs = schema.parse_sorted(["10.5", "-3", "2", "100"])
        assert [v for v, _ in pairs] == [-3.0, 2.0, 10.5, 100.0]
        assert [s for _, s in pairs] == ["-3", "2", "10.5", "100"]

    def test_fmt_float(self):
        assert schema.fmt_float(0.008) == "0.008"
        assert schema.fmt_float(100.0) == "100"
        assert schema.fmt_float(-50.5) == "-50.5"

    def test_tree_paths(self):
        assert schema.wkern_dataset(0.008, "200") == "/wkern/0.008/200/kern"
        assert (
            schema.akern_dataset(0.008, "3", "55000", "150000000")
            == "/akern/0.008/3/55000/150000000/kern"
        )


class TestFacade:
    def test_facade_backend_resolves(self, tmp_path):
        p = str(tmp_path / "f.h5")
        h5.create_file(p)
        h5.write_dataset(p, "/z", np.arange(6.0).reshape(2, 3))
        np.testing.assert_array_equal(
            h5.read_dataset(p, "/z"), np.arange(6.0).reshape(2, 3)
        )
        assert h5.backend_name() in ("native", "h5py")
