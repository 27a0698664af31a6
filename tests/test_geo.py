"""Map-overlay unit tests (ref decode_noaa.py:98-253, main.py:232-265).

The geo dependencies (pyorbital, basemap, cartopy) are not installed in CI;
the pure geometry/time helpers are tested directly and the overlay pipeline
is smoke-tested with fake modules injected into sys.modules.
"""
import sys
import types
from datetime import datetime

import numpy as np
import pytest

from directdemod_tpu.models import geo


# ---------------------------------------------------------------- pure parts

def test_bearing_reversed_convention():
    # due east along the equator: standard bearing 90, reference returns 360-90
    assert geo.bearing_deg(0.0, 0.0, 0.0, 1.0) == pytest.approx(270.0)
    # due north: standard bearing 0 -> reference 360 (not normalized to 0,
    # matching ref decode_noaa.py:149-150 which subtracts after the % 360)
    assert geo.bearing_deg(0.0, 0.0, 1.0, 0.0) == pytest.approx(360.0)
    # due south
    assert geo.bearing_deg(1.0, 0.0, 0.0, 0.0) == pytest.approx(180.0)


def test_offset_latlon_roundtrip():
    one_deg_m = 6371000.0 * np.pi / 180.0
    lat, lon = geo.offset_latlon([10.0, 20.0], 0.0, one_deg_m)
    assert lat == pytest.approx(11.0)
    assert lon == pytest.approx(20.0)
    # longitude offset scales by 1/cos(lat)
    lat, lon = geo.offset_latlon([60.0, 0.0], one_deg_m, 0.0)
    assert lat == pytest.approx(60.0)
    assert lon == pytest.approx(1.0 / np.cos(np.radians(60.0)))


def test_capture_time_from_filename():
    t = geo.capture_time_from_filename(
        "SDRSharp_20190521_170204Z_137500000Hz_IQ.wav")
    assert t == datetime(2019, 5, 21, 17, 2, 4)
    assert geo.capture_time_from_filename("capture.wav") is None
    assert geo.capture_time_from_filename("x_20190521_1702Z_y.wav") is None
    assert geo.capture_time_from_filename("x_baddate_170204Z_y.wav") is None


# ------------------------------------------------------------- mocked overlay

class _FakeOrbital:
    """Deterministic southbound pass over 50N 10E."""

    def __init__(self, satellite, tle_file=None):
        self.satellite = satellite
        self.tle_file = tle_file

    def get_lonlatalt(self, when: datetime):
        s = when.timestamp() % 10000
        return (10.0, 50.0 - s * 1e-4, 850.0)   # (lon, lat, alt)


def _install_fake(monkeypatch, name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    monkeypatch.setitem(sys.modules, name, mod)
    return mod


@pytest.fixture
def fake_pyorbital(monkeypatch):
    _install_fake(monkeypatch, "pyorbital")
    _install_fake(monkeypatch, "pyorbital.orbital", Orbital=_FakeOrbital)


def _image(rows=24):
    rng = np.random.default_rng(0)
    return rng.integers(0, 255, size=(rows, 1040), dtype=np.uint8)


def test_overlay_without_pyorbital(monkeypatch, tmp_path):
    monkeypatch.setitem(sys.modules, "pyorbital", None)
    monkeypatch.setitem(sys.modules, "pyorbital.orbital", None)
    out = geo.map_overlay(_image(), datetime(2019, 5, 21), "NOAA 19",
                          str(tmp_path / "r.png"), str(tmp_path / "n.png"))
    assert out == []


def test_overlay_without_any_renderer(monkeypatch, tmp_path, caplog):
    """pyorbital present, basemap AND cartopy missing -> error + no files
    (ref decode_noaa.py:125-132)."""
    _install_fake(monkeypatch, "pyorbital")
    _install_fake(monkeypatch, "pyorbital.orbital", Orbital=_FakeOrbital)
    monkeypatch.setitem(sys.modules, "mpl_toolkits.basemap", None)
    monkeypatch.setitem(sys.modules, "cartopy", None)
    monkeypatch.setitem(sys.modules, "cartopy.crs", None)
    with caplog.at_level("WARNING", logger="directdemod_tpu.models.geo"):
        out = geo.map_overlay(_image(), datetime(2019, 5, 21), "NOAA 19",
                              str(tmp_path / "r.png"), str(tmp_path / "n.png"))
    assert out == []
    assert any("basemap not installed" in m for m in caplog.messages)
    assert any("cartopy not installed" in m for m in caplog.messages)


def test_overlay_basemap_preferred(fake_pyorbital, monkeypatch, tmp_path):
    """Fake basemap renders and is preferred; the reverse-rotated no-rot image
    is produced from the rendered png."""
    calls = {}

    class _FakeBasemap:
        def __init__(self, **kw):
            calls["init"] = kw

        def drawcoastlines(self, **kw):
            calls["coast"] = True

        def drawcountries(self, **kw):
            calls["countries"] = True

    _install_fake(monkeypatch, "mpl_toolkits.basemap", Basemap=_FakeBasemap)
    rot = tmp_path / "rot.png"
    norot = tmp_path / "norot.png"
    out = geo.map_overlay(_image(), datetime(2019, 5, 21, 17, 2, 4), "NOAA 19",
                          str(rot), str(norot))
    assert calls["init"]["projection"] == "cass"
    assert calls["coast"] and calls["countries"]
    assert str(rot) in out and rot.exists()
    assert str(norot) in out and norot.exists()
    from PIL import Image
    assert Image.open(norot).size[0] == 910    # cropped back to 995-85 cols


def test_overlay_from_filename_glue(fake_pyorbital, monkeypatch, tmp_path):
    class _Dec:
        image_a = _image()

    monkeypatch.setitem(sys.modules, "mpl_toolkits.basemap", None)
    monkeypatch.setitem(sys.modules, "cartopy", None)
    monkeypatch.setitem(sys.modules, "cartopy.crs", None)
    # unknown satellite frequency
    assert geo.map_overlay_from_filename(
        _Dec(), "SDRSharp_20190521_170204Z_137500000Hz_IQ.wav", 137_000_000,
        "r.png", "n.png", None) == []
    # no timestamp in the file name
    assert geo.map_overlay_from_filename(
        _Dec(), "capture.wav", 137_100_000, "r.png", "n.png", None) == []


# --------------------------------------------------------------- TLE handling

def test_parse_tle_fixture():
    """The bundled synthetic TLE fixture parses with valid checksums
    (ungated: no pyorbital needed)."""
    import os
    path = os.path.join(os.path.dirname(__file__), "..", "tle",
                        "noaa18_synthetic.txt")
    tles = geo.parse_tle(path)
    assert "NOAA 18" in tles
    l1, l2 = geo.select_tle(path, "noaa 18")
    assert l1.startswith("1 28654U") and l2.startswith("2 28654")


def test_parse_tle_rejects_corruption(tmp_path):
    good = ("NOAA 18\n"
            "1 28654U 05018A   26233.50000000  .00000100  00000-0  60000-4 0  9991\n"
            "2 28654  98.8500 210.0000 0014000 120.0000 240.2500 14.12500000 10005\n")
    p = tmp_path / "t.txt"
    p.write_text(good)
    assert "NOAA 18" in geo.parse_tle(str(p))
    # flip a digit -> checksum warns but parses (pyorbital tolerates
    # checksum deviations; hard-failing aborted working overlays, ADVICE
    # r04 — structural errors below stay fatal)
    p.write_text(good.replace("98.8500", "98.8600"))
    assert "NOAA 18" in geo.parse_tle(str(p))
    # truncated file
    p.write_text(good[: len(good) // 2])
    with pytest.raises(ValueError):
        geo.parse_tle(str(p))
    p.write_text(good)
    with pytest.raises(KeyError):
        geo.select_tle(str(p), "METEOR M2")


def test_parse_tle_3le_and_bare_formats(tmp_path):
    """3LE '0 NAME' lines and bare 2-line files parse (pyorbital accepts
    both; hard-failing them aborted previously-working overlays — ADVICE
    r04)."""
    from directdemod_tpu.models import geo
    good = open("tle/noaa18_synthetic.txt").read().strip().splitlines()
    name, l1, l2 = good[0], good[1], good[2]
    p3 = tmp_path / "three.tle"
    p3.write_text(f"0 {name}\n{l1}\n{l2}\n")
    tles = geo.parse_tle(str(p3))
    assert name.strip() in tles
    p2 = tmp_path / "bare.tle"
    p2.write_text(f"{l1}\n{l2}\n")
    tles = geo.parse_tle(str(p2))
    assert l1[2:7] in tles


def test_parse_tle_checksum_warns_not_fails(tmp_path, caplog):
    from directdemod_tpu.models import geo
    good = open("tle/noaa18_synthetic.txt").read().strip().splitlines()
    name, l1, l2 = good[0], good[1], good[2]
    bad1 = l1[:68] + str((int(l1[68]) + 1) % 10)
    p = tmp_path / "ck.tle"
    p.write_text(f"{name}\n{bad1}\n{l2}\n")
    import logging
    with caplog.at_level(logging.WARNING):
        tles = geo.parse_tle(str(p))
    assert name.strip() in tles
    assert any("checksum" in r.message for r in caplog.records)


def test_parse_tle_trailing_truncated_entry_raises(tmp_path):
    """A trailing name+line1 fragment must be a clear error, not silently
    dropped (ADVICE r04)."""
    from directdemod_tpu.models import geo
    import pytest
    good = open("tle/noaa18_synthetic.txt").read().strip().splitlines()
    name, l1, l2 = good[0], good[1], good[2]
    p = tmp_path / "trunc.tle"
    p.write_text(f"{name}\n{l1}\n{l2}\nLEFTOVER SAT\n{l1}\n")
    with pytest.raises(ValueError, match="truncated"):
        geo.parse_tle(str(p))
