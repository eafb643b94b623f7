"""Source operators S1-S5 + S8 sink — the reference's three input modes
(tests/test_feature_preprocessing.py:74-178 semantics, our fixtures)."""

from __future__ import annotations

import numpy as np
import pytest

from pic2vec_spark.codecs import encode_image
from pic2vec_spark.sources import (
    combined_csv_directory,
    csv_compat_name,
    image_source,
    save_csv_compat,
    scan_csv,
    scan_image_directory,
)
from pic2vec_spark.synth import _gen_pixels


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    """Directory with natural-sort-challenging names + an invalid gif
    (the reference's heidegger.gif exclusion case)."""
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(3)
    names = ["img2.png", "img10.png", "img1.bmp", "photo.jpg", "bad.gif", "x.txt"]
    for n in names:
        ext = n.rsplit(".", 1)[-1]
        if ext in ("png", "bmp", "jpg"):
            (d / n).write_bytes(encode_image(_gen_pixels(rng, 20, 16), ext))
        else:
            (d / n).write_bytes(b"not an image")
    return str(d)


@pytest.fixture(scope="module")
def csv_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("csv")
    p = d / "data.csv"
    p.write_text(
        "image,derp\n"
        "img1.bmp,a\n"
        "img2.png,b\n"
        "missing.png,c\n"
        "img10.png,d\n"
    )
    return str(p)


def test_directory_scan_filters_and_natural_sorts(spark, image_dir):
    out = scan_image_directory(spark, image_dir).toPandas()
    # gif and txt excluded (format filter, feature_preprocessing.py:118)
    assert set(out.image_id) == {"img1.bmp", "img2.png", "img10.png", "photo.jpg"}
    # natural order: img1 < img2 < img10 (not lexicographic img10 < img2)
    assert list(out.image_id[:3]) == ["img1.bmp", "img2.png", "img10.png"]
    assert all(len(b) > 0 for b in out.bytes)


def test_csv_scan_validates_column(spark, csv_file):
    out = scan_csv(spark, csv_file, "image")
    assert out.count() == 4
    with pytest.raises(ValueError, match="missing from CSV header"):
        scan_csv(spark, csv_file, "nope")


def test_combined_join_missing_semantics(spark, csv_file, image_dir):
    out = combined_csv_directory(spark, csv_file, "image", image_dir).toPandas()
    assert len(out) == 4  # CSV rows preserved
    by_img = out.set_index("image")
    assert by_img.loc["missing.png", "bytes"] is None  # '' sentinel analogue
    assert by_img.loc["img1.bmp", "bytes"] is not None
    assert by_img.loc["img1.bmp", "derp"] == "a"  # extra columns ride along


def test_combined_zero_overlap_errors(spark, image_dir, tmp_path):
    p = tmp_path / "none.csv"
    p.write_text("image,derp\nnope1.png,a\nnope2.png,b\n")
    with pytest.raises(ValueError, match="zero overlap"):
        combined_csv_directory(spark, str(p), "image", image_dir)


def test_dispatcher_three_cases(spark, csv_file, image_dir):
    assert image_source(spark, directory=image_dir).count() == 4
    assert image_source(spark, "image", csv_path=csv_file).count() == 4
    assert (
        image_source(spark, "image", directory=image_dir, csv_path=csv_file).count()
        == 4
    )
    with pytest.raises(ValueError):
        image_source(spark)


def test_combined_featurizes_end_to_end(spark, csv_file, image_dir):
    """The reference's flagship CSV+dir flow: combined scan -> featurize;
    the missing row gets missing=True + f(0)."""
    from pic2vec_spark.featurize import featurize_images
    from pic2vec_spark.plan import FeaturizerPlan

    df = combined_csv_directory(spark, csv_file, "image", image_dir)
    plan = FeaturizerPlan.build("squeezenet", depth=1, autosample=True)
    out = featurize_images(df, plan).toPandas().set_index("image")
    assert bool(out.loc["missing.png", "missing"])
    assert not bool(out.loc["img1.bmp", "missing"])
    assert len(out.loc["img1.bmp", "features"]) == 256


def test_csv_compat_sink(spark, tmp_path):
    df = spark.createDataFrame(
        [(0, False, [1.0, 2.0]), (1, True, [0.0, 0.0])],
        "row_id int, missing boolean, features array<float>",
    )
    name = csv_compat_name("base", "squeezenet", 1, 2, omit_time=True)
    assert name == "base_squeezenet_depth-1_output-2.csv"
    out = save_csv_compat(
        df, str(tmp_path / "t"), "image", "squeezenet", 1, 2, omit_time=True
    )
    import pandas as pd

    back = pd.read_csv(out)
    assert list(back.columns) == ["row_id", "image_missing", "image_feat_0", "image_feat_1"]
