"""ImageFeaturizer facade: the reference's primary API surface
(/root/reference/pic2vec/image_featurizer.py:93-534, test shape from
/root/reference/tests/test_image_featurizer.py) driven end-to-end over
a real image directory + CSV, checked against the engine's direct path."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pic2vec_spark import ImageFeaturizer
from pic2vec_spark.codecs import encode_image
from pic2vec_spark.sources import named_path

N_FEATURES = 256  # squeezenet depth-1 autosample


def _pixels(seed: int, w: int = 60, h: int = 40) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3)).astype(np.uint8)


@pytest.fixture(scope="module")
def img_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    # natural-sort exercise: img2 must sort before img10
    for name, seed, fmt in [
        ("img2.jpg", 1, "jpg"),
        ("img10.png", 2, "png"),
        ("borges.jpg", 3, "jpg"),
    ]:
        (d / name).write_bytes(encode_image(_pixels(seed), fmt))
    return str(d)


@pytest.fixture(scope="module")
def csv_path(tmp_path_factory, img_dir):
    d = tmp_path_factory.mktemp("csvs")
    p = d / "refs.csv"
    # matched, blank, and unmatched refs — the reference's three classes
    pd.DataFrame(
        {"images": ["borges.jpg", "", "img2.jpg", "nope.jpg"],
         "label": ["a", "b", "c", "d"]}
    ).to_csv(p, index=False)
    return str(p)


@pytest.fixture(scope="module")
def featurizer(spark):
    return ImageFeaturizer(
        depth=1, autosample=True, model="squeezenet", spark=spark
    )


def test_init_attrs_and_guards(spark):
    f = ImageFeaturizer(depth=2, autosample=True, spark=spark)
    assert f.model_name == "squeezenet"
    assert f.depth == 2
    assert f.num_features > 0
    with pytest.raises(ValueError):
        ImageFeaturizer(depth=9, spark=spark)
    with pytest.raises(ValueError):
        ImageFeaturizer(model="alexnet", spark=spark)


def test_dir_only_flow_matches_engine(spark, featurizer, img_dir):
    """featurize(dir) == engine featurize_images on the same scan, and
    the frame is in natural-sort order (img2 before img10)."""
    from pic2vec_spark.featurize import featurize_images
    from pic2vec_spark.sources import scan_image_directory

    full = (
        featurizer.featurize("images", image_path=img_dir)
        .toPandas().sort_values("row_id").reset_index(drop=True)
    )
    assert list(full["images"]) == ["borges.jpg", "img2.jpg", "img10.png"]
    assert not full["images_missing"].any()
    assert f"images_feat_{N_FEATURES - 1}" in full.columns
    assert f"images_feat_{N_FEATURES}" not in full.columns

    ref = (
        featurize_images(scan_image_directory(spark, img_dir), featurizer.plan)
        .select("image_id", "features").toPandas().set_index("image_id")
    )
    for _, row in full.iterrows():
        want = np.asarray(ref.loc[row["images"], "features"], dtype=np.float32)
        got = row[[f"images_feat_{i}" for i in range(N_FEATURES)]].to_numpy(
            dtype=np.float32
        )
        assert np.allclose(got, want, atol=1e-5)


def test_csv_combined_missing_semantics_and_save(
    spark, featurizer, img_dir, csv_path, tmp_path
):
    """Blank and unmatched refs -> missing=True + the f(0) zero vector
    (feature_preprocessing.py:212-215); matched rows keep CSV columns;
    save_csv writes the full frame in CSV order."""
    out_csv = str(tmp_path / "out.csv")
    full = featurizer.featurize(
        "images", image_path=img_dir, csv_path=csv_path,
        save_csv=True, new_csv_path=out_csv,
    )
    pdf = full.toPandas().sort_values("row_id").reset_index(drop=True)
    assert pdf["images_missing"].tolist() == [False, True, False, True]
    # missing rows all carry the SAME zero-input vector
    z1 = pdf.loc[1, [f"images_feat_{i}" for i in range(N_FEATURES)]].to_numpy(float)
    z2 = pdf.loc[3, [f"images_feat_{i}" for i in range(N_FEATURES)]].to_numpy(float)
    assert np.allclose(z1, z2)
    assert pdf["label"].tolist() == ["a", "b", "c", "d"]

    disk = pd.read_csv(out_csv)
    assert len(disk) == 4
    assert "row_id" not in disk.columns  # internal order key stripped
    assert disk["label"].tolist() == ["a", "b", "c", "d"]
    assert disk["images_missing"].tolist() == [False, True, False, True]


def test_csv_only_url_mode(spark, featurizer, img_dir, tmp_path):
    """S6 URL-mode ingestion (reference feature_preprocessing.py:311-317):
    csv-only entries are URLs, fetched executor-side; failures (blank,
    nonexistent, non-URL string) -> missing=True zero vectors, matched
    URLs featurize identically to the bytes-in-table path."""
    import pandas as _pd

    from pic2vec_spark.featurize import featurize_images
    from pic2vec_spark.sources import fetch_url_images, scan_image_directory

    good_png = f"file://{img_dir}/img10.png"
    good_jpg = f"file://{img_dir}/borges.jpg"
    p = tmp_path / "urls.csv"
    _pd.DataFrame(
        {
            "images": [good_png, "", good_jpg, f"file://{img_dir}/ghost.png",
                       good_png],
            "label": ["a", "b", "c", "d", "e"],
        }
    ).to_csv(p, index=False)

    featurizer.url_schemes = ("http", "https", "file")  # test opt-in
    full = (
        featurizer.featurize("images", csv_path=str(p))
        .toPandas().sort_values("row_id").reset_index(drop=True)
    )
    assert full["images_missing"].tolist() == [False, True, False, True, False]
    assert full["label"].tolist() == ["a", "b", "c", "d", "e"]
    # duplicate URL rows carry identical features (one fetch, one CNN run)
    f0 = full.loc[0, [f"images_feat_{i}" for i in range(N_FEATURES)]]
    f4 = full.loc[4, [f"images_feat_{i}" for i in range(N_FEATURES)]]
    assert np.allclose(f0.to_numpy(float), f4.to_numpy(float))
    # matched URL features == the bytes-in-table engine path
    ref = (
        featurize_images(scan_image_directory(spark, img_dir), featurizer.plan)
        .select("image_id", "features").toPandas().set_index("image_id")
    )
    want = np.asarray(ref.loc["img10.png", "features"], dtype=np.float32)
    assert np.allclose(f0.to_numpy(dtype=np.float32), want, atol=1e-5)

    # unit shape: distinct URLs fetched once, fmt parsed, failures NULL
    refs = spark.createDataFrame(
        [(good_png,), (good_png,), ("file://nope/x.jpg",), ("not a url",)],
        "images string",
    )
    got = fetch_url_images(
        spark, refs, "images", allowed_schemes=("http", "https", "file")
    ).toPandas()
    assert len(got) == 3  # distinct
    row = got.set_index("image_id")
    assert row.loc[good_png, "fmt"] == "png"
    assert row.loc[good_png, "bytes"] is not None
    assert row.loc["file://nope/x.jpg", "bytes"] is None
    assert row.loc["not a url", "bytes"] is None

    # default allowlist (http/https only): file:// URLs are NOT fetched
    # — SSRF/local-read guard for untrusted CSVs — they degrade to NULL
    # bytes exactly like a failed fetch
    blocked = fetch_url_images(spark, refs, "images").toPandas()
    assert blocked.set_index("image_id").loc[good_png, "bytes"] is None


def test_two_step_equals_one_step(spark, featurizer, img_dir):
    """load_data -> featurize_preloaded_data == featurize (EP2 == EP3)."""
    featurizer.load_data("images", image_path=img_dir)
    two = (
        featurizer.featurize_preloaded_data()
        .toPandas().sort_values("row_id").reset_index(drop=True)
    )
    one = (
        featurizer.featurize("images", image_path=img_dir)
        .toPandas().sort_values("row_id").reset_index(drop=True)
    )
    cols = [f"images_feat_{i}" for i in range(N_FEATURES)]
    assert np.allclose(
        two[cols].to_numpy(float), one[cols].to_numpy(float), atol=1e-5
    )


def test_named_path_switches():
    """All four omit switches, independently, in the reference's exact
    format (image_featurizer.py:804-857)."""
    base = named_path("x", "squeezenet", 2, 256, omit_time=True)
    assert base == "x_squeezenet_depth-2_output-256"
    assert named_path("x", "m", 1, 8, omit_model=True, omit_time=True) == "x_depth-1_output-8"
    assert named_path("x", "m", 1, 8, omit_depth=True, omit_time=True) == "x_m_output-8"
    assert named_path("x", "m", 1, 8, omit_output=True, omit_time=True) == "x_m_depth-1"
    timed = named_path("x", "m", 1, 8)
    assert timed.startswith("x_m_depth-1_output-8_(") and timed.endswith(")")


def test_error_paths(spark, featurizer, csv_path):
    with pytest.raises(ValueError, match="either image_path or csv_path"):
        featurizer.load_data("images")
    with pytest.raises(ValueError, match="single image column"):
        featurizer.load_data(["a", "b"], image_path="/tmp")
    fresh = ImageFeaturizer(spark=spark)
    with pytest.raises(IOError, match="load_data"):
        fresh.featurize_preloaded_data()
    with pytest.raises(AttributeError, match="featurized"):
        fresh.save_csv()


def test_clear_input(spark, featurizer, img_dir):
    featurizer.load_data("images", image_path=img_dir)
    with pytest.raises(ValueError, match="confirm=True"):
        featurizer.clear_input()
    featurizer.clear_input(confirm=True)
    assert featurizer.data is None
    assert featurizer.image_columns == []


def test_grayscale_fails_fast_with_reason(spark, featurizer, img_dir):
    featurizer.load_data("images", image_path=img_dir, grayscale=True)
    with pytest.raises(ValueError, match="grayscale"):
        featurizer.featurize_preloaded_data()
    featurizer.load_data("images", image_path=img_dir)  # restore rgb state


def test_zero_overlap_csv_errors(spark, featurizer, img_dir, tmp_path):
    """A CSV whose refs match no directory image must raise (S4 guard),
    not silently produce all-missing zero-vector rows."""
    p = tmp_path / "bad.csv"
    pd.DataFrame({"images": ["/abs/path/cat.jpg", "other.png"]}).to_csv(
        p, index=False
    )
    with pytest.raises(ValueError, match="no images in the directory match"):
        featurizer.load_data("images", image_path=img_dir, csv_path=str(p))


def test_csv_prunes_unreferenced_directory_images(
    spark, featurizer, img_dir, csv_path
):
    """With a CSV, only referenced images pay the decode+CNN cost: the
    directory has 3 images but the CSV references 2, so loaded data has
    2 rows (the reference also featurizes only listed images) — and the
    featurized frame is unaffected."""
    featurizer.load_data(
        "images", image_path=img_dir, csv_path=csv_path, save_data=True
    )
    loaded = featurizer.data.select("image_id").toPandas()
    assert sorted(loaded["image_id"]) == ["borges.jpg", "img2.jpg"]
    full = featurizer.featurize_preloaded_data().toPandas()
    assert len(full) == 4  # all CSV rows survive, pruning is input-side
    featurizer.clear_input(confirm=True)


def test_features_only_csv_aligns_with_main_csv(
    spark, featurizer, img_dir, csv_path, tmp_path
):
    """The *_features_only CSV must be row-aligned with the main CSV
    (both sorted by the internal row_id before writing)."""
    out_csv = str(tmp_path / "pair.csv")
    featurizer.featurize(
        "images", image_path=img_dir, csv_path=csv_path,
        save_features=True, save_csv=True, new_csv_path=out_csv,
    )
    main = pd.read_csv(out_csv)
    feats = pd.read_csv(str(tmp_path / "pair_features_only.csv"))
    assert len(main) == len(feats)
    assert "row_id" not in feats.columns
    assert main["images_missing"].tolist() == feats["images_missing"].tolist()
    f_cols = [c for c in feats.columns if c.startswith("images_feat_")]
    assert np.allclose(
        main[f_cols].to_numpy(float), feats[f_cols].to_numpy(float)
    )
