"""Advanced combined search: filename + EXIF + geo, AND-composed."""
from pathlib import Path

import pytest

from rupphash_tpu import search
from rupphash_tpu.grouping import engine


def _rec(name, gps=None, ts=None, quality=None, res=None):
    return engine.FileRecord(path=Path(name), gps_pos=gps,
                             exif_timestamp=ts, pdq_quality=quality,
                             resolution=res, content_hash=b"")


@pytest.fixture
def records():
    return [
        _rec("/p/helsinki_cathedral.jpg", gps=(60.1699, 24.9384),
             ts=1000, quality=90, res=(4000, 3000)),
        _rec("/p/tampere_lake.jpg", gps=(61.4978, 23.7610),
             ts=2000, quality=95, res=(4000, 3000)),
        _rec("/p/paris_tower.jpg", gps=(48.8584, 2.2945),
             ts=3000, quality=40, res=(1920, 1080)),
        _rec("/p/nogps_scan.png", gps=None, ts=None, quality=10,
             res=(640, 480)),
    ]


def test_filename_search(records):
    out = search.search_records(records, "tampere")
    assert [r.path.name for r in out] == ["tampere_lake.jpg"]
    out = search.search_records(records, "jpg$")
    assert len(out) == 3


def test_geo_filter(records):
    out = search.search_records(records,
                                "distancelonlat:24.9384:60.1699:200")
    names = {r.path.name for r in out}
    assert names == {"helsinki_cathedral.jpg", "tampere_lake.jpg"}


def test_geo_with_named_location(records):
    out = search.search_records(
        records, "DistanceFrom:paris:50",
        locations={"paris": [48.8566, 2.3522]})
    assert [r.path.name for r in out] == ["paris_tower.jpg"]


def test_exif_criteria_from_record_fields(records):
    out = search.search_records(records, "quality:>=:90")
    assert {r.path.name for r in out} == {"helsinki_cathedral.jpg",
                                          "tampere_lake.jpg"}
    out = search.search_records(records, "width:1920")
    assert [r.path.name for r in out] == ["paris_tower.jpg"]


def test_and_composition(records):
    out = search.search_records(
        records, "jpg$ quality:>=:90 distancelonlat:24.9384:60.1699:50")
    assert [r.path.name for r in out] == ["helsinki_cathedral.jpg"]


def test_unknown_location_raises(records):
    with pytest.raises(ValueError):
        search.search_records(records, "DistanceFrom:nowhere:5")
