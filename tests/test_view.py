"""View-mode streaming scan + enrichment."""
import numpy as np
import pytest
from PIL import Image

from rupphash_tpu.cache.store import CacheStore
from rupphash_tpu.pipeline import view


@pytest.fixture
def viewdir(tmp_path):
    d = tmp_path / "v"
    (d / "sub").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(5):
        Image.fromarray(rng.integers(0, 256, (40, 60, 3),
                                     dtype=np.uint8)).save(d / f"img{i}.png")
    Image.fromarray(np.zeros((20, 20, 3), dtype=np.uint8)).save(
        d / "sub" / "nested.png")
    return d


def test_list_view_flat_vs_flatten(viewdir):
    recs, subdirs = view.list_view([viewdir], recursive=False)
    assert len(recs) == 5
    assert [d.name for d in subdirs] == ["sub"]
    recs2, _ = view.list_view([viewdir], recursive=True)
    assert len(recs2) == 6


def test_stream_batches(viewdir):
    recs, _ = view.list_view([viewdir])
    batches = list(view.stream_batches(recs, batch=2))
    assert [len(b) for b in batches] == [2, 2, 1]


def test_enrichment_fills_features_and_cache(viewdir, tmp_path):
    store = CacheStore(tmp_path / "c.db", master_key=b"\x0a" * 32)
    recs, _ = view.list_view([viewdir], store=store)
    assert all(r.resolution is None for r in recs)
    enr = view.Enrichment(recs, store=store, workers=2)
    enr.start()
    enr.join(timeout=30)
    got = []
    while not enr.results.empty():
        got.append(enr.results.get())
    assert len(got) == 5
    assert all(r.resolution == (60, 40) for r in recs)
    store.flush()
    # second pass: features come from the cache, enrichment has no work
    recs2, _ = view.list_view([viewdir], store=store)
    assert all(r.resolution == (60, 40) for r in recs2)
    assert view.Enrichment(recs2, store=store).records == []
    store.close()


def test_sort_applied(viewdir):
    recs, _ = view.list_view([viewdir], sort="name-desc")
    names = [r.path.name for r in recs]
    assert names == sorted(names, reverse=True)
