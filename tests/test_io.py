"""Tests for the io layer — matches the reference data_IO test contract
(/root/reference/tests/test_data_IO.py) plus h5 round-trip and sort-order checks."""

import numpy as np
from pathlib import Path
import pytest

from bayesian_inference_tpu import io


def test_observable_matrix_round_trip(test_data_dir):
    """matrix -> dict -> matrix round trip is exact on the real fixture."""
    observables = io.read_dict_from_h5(str(test_data_dir), "observables.h5", verbose=False)
    Y = io.predictions_matrix_from_h5(str(test_data_dir), filename="observables.h5", validation_set=False)
    Y_dict = io.observable_dict_from_matrix(Y, observables, validation_set=False)
    Y_round_trip = io.observable_matrix_from_dict(Y_dict)
    np.testing.assert_allclose(Y, Y_round_trip)


def test_h5_dict_round_trip(tmp_path):
    d = {
        "a": {"b": np.arange(6.0).reshape(2, 3), "c": np.array([1, 2, 3])},
        "scalar": np.float64(3.5),
        "nested": {"deep": {"x": np.ones(4)}},
        "none_is_dropped": None,
    }
    io.write_dict_to_h5(d, str(tmp_path), "t.h5", verbose=False)
    back = io.read_dict_from_h5(str(tmp_path), "t.h5", verbose=False)
    np.testing.assert_allclose(back["a"]["b"], d["a"]["b"])
    np.testing.assert_allclose(back["a"]["c"], d["a"]["c"])
    np.testing.assert_allclose(back["nested"]["deep"]["x"], d["nested"]["deep"]["x"])
    assert back["scalar"] == 3.5
    assert "none_is_dropped" not in back


def test_h5_modify_semantics(tmp_path):
    io.write_dict_to_h5({"a": np.array([1.0]), "b": np.array([2.0])}, str(tmp_path), "t.h5", verbose=False)
    io.write_dict_to_h5({"a": np.array([9.0, 9.0])}, str(tmp_path), "t.h5", verbose=False)
    back = io.read_dict_from_h5(str(tmp_path), "t.h5", verbose=False)
    np.testing.assert_allclose(back["a"], [9.0, 9.0])
    np.testing.assert_allclose(back["b"], [2.0])


def test_sort_order_precedence():
    labels = [
        "5020__PbPb__jet__pt__sub__0-10",
        "200__AuAu__jet__pt__sub__0-10",
        "2760__PbPb__hadron__pt__sub__0-5",
        "2760__PbPb__jet__Dz__sub__0-10",
    ]
    out = io.observables.sort_observable_labels(labels)
    # observable_type first (hadron < jet), then observable (Dz < pt), then sqrts.
    assert out == [
        "2760__PbPb__hadron__pt__sub__0-5",
        "2760__PbPb__jet__Dz__sub__0-10",
        "200__AuAu__jet__pt__sub__0-10",
        "5020__PbPb__jet__pt__sub__0-10",
    ]


def test_observable_filter_globs():
    f = io.ObservableFilter(include_list=["jet__pt_"], exclude_list=["*atlas*"])
    assert f.accept_observable("5020__PbPb__inclusive_jet__pt_alice__x__0-10")
    assert not f.accept_observable("5020__PbPb__inclusive_jet__pt_y_atlas__x__0-10")
    assert not f.accept_observable("5020__PbPb__hadron__pt_ch__x__0-10")
    g = io.ObservableFilter(include_list=["*zg_*"])
    assert g.accept_observable("5020__PbPb__chjet__zg_alice__x__0-10")


@pytest.mark.parametrize(
    "design_points_to_exclude", [[17, 43, 203], []], ids=["exclude", "no_exclude"]
)
@pytest.mark.parametrize("parameterization", ["test1", "test2"], ids=["continuous", "discontinuous"])
def test_exclude_design_points(test_data_dir, design_points_to_exclude, parameterization):
    """Index-vs-design-point-id bookkeeping with missing points and exclusions."""
    from bayesian_inference_tpu.io import tables

    read_params = np.loadtxt(test_data_dir / "tables" / "Design" / f"Design__{parameterization}.dat", ndmin=2)
    n_missing = 0 if parameterization == "test1" else 2
    assert read_params.shape == (230 - n_missing, 6)

    ids = tables.read_design_points_from_design_dat(test_data_dir / "tables", parameterization)
    train_idx, train_ids, val_idx, val_ids = tables.split_training_validation_indices(
        design_points=ids,
        validation_indices=list(range(200, 230)),
        design_points_to_exclude=design_points_to_exclude,
    )

    train_params = read_params[train_idx]
    val_params = read_params[val_idx]

    excl_main = [i for i in design_points_to_exclude if i < 200]
    excl_val = [i for i in design_points_to_exclude if i >= 200]
    assert train_params.shape == (200 - len(excl_main) - n_missing, 6)
    assert val_params.shape == (30 - len(excl_val), 6)

    for excluded_point in design_points_to_exclude:
        assert excluded_point not in train_ids
        assert excluded_point not in val_ids
        values = list(range(excluded_point * 6, excluded_point * 6 + 6))
        assert values not in train_params
        assert values not in val_params


def test_latex_from_tlatex():
    from bayesian_inference_tpu.plots.utils import latex_from_tlatex

    assert latex_from_tlatex("#theta_{g}") == r"$\theta_{g}$"
    out = latex_from_tlatex("p_{T} (GeV)")
    assert out.startswith("$") and out.endswith("$") and r"\;" in out


def test_observable_panels_stat_titles_and_multishape(tmp_path):
    """observable_panels honors multi-shape plot_panel_shapes (one figure per
    shape, reference plot_utils.py:42-47, 131-137) and pulls axis titles from
    STAT_<sqrts>.yaml via latex_from_tlatex (reference plot_utils.py:52-61)."""
    import types

    from bayesian_inference_tpu.io import hdf5, observables as obs_io
    from bayesian_inference_tpu.plots.utils import (
        _load_stat_plot_block,
        latex_from_tlatex,
        observable_panels,
    )

    data_dir = Path(__file__).parent / "test_data"
    observables = hdf5.read_dict_from_h5(str(data_dir), "observables.h5", verbose=False)
    sorted_labels = obs_io.sorted_observable_list_from_dict(observables)
    n_features = sum(
        len(np.atleast_1d(observables["Data"][lab]["xmin"])) for lab in sorted_labels
    )
    config = types.SimpleNamespace(
        analysis_config={"plot_panel_shapes": [[2, 2], [2, 2], [2, 2], [2, 2]]},
        observable_config_dir=str(data_dir),
    )

    # STAT axis-title block resolves for a fixture observable
    block = _load_stat_plot_block(config, "200", "hadron", "pt_ch_star", {})
    assert block is not None
    assert latex_from_tlatex(block["xtitle"]) == r"$p_{T}\;(GeV/{c})$"
    assert latex_from_tlatex(block["ytitle_AA"]) == r"${R}_{AA}$"

    rng = np.random.default_rng(0)
    preds = {"central_value": rng.uniform(0.5, 1.0, (10, n_features))}
    observable_panels(
        plot_list=[preds], labels=["pred"], colors=["steelblue"],
        config=config, plot_dir=str(tmp_path), filename="panels.pdf",
        observables=observables, sorted_labels=sorted_labels,
    )
    produced = sorted(p.name for p in tmp_path.glob("panels*.pdf"))
    # 16 observables / 4 panels per 2x2 figure = 4 figures
    assert produced == ["panels__0.pdf", "panels__1.pdf", "panels__2.pdf", "panels__3.pdf"]


def test_synthetic_production_tables_ingest(tmp_path):
    """io/synthetic.py writes a production-width table set that round-trips
    through the real ingest path (io/tables.py) with the production groups."""
    from bayesian_inference_tpu.io.synthetic import (
        make_production_tables,
        production_observable_labels,
    )
    from bayesian_inference_tpu.io.tables import initialize_observables_dict_from_tables

    labels = make_production_tables(tmp_path, n_design=40, seed=3)
    assert labels == production_observable_labels()

    analysis_config = {
        "sqrts_list": [200, 2760, 5020],
        "centrality_range": [0, 10],
        "validation_indices": [30, 40],
        "design_points_to_exclude": [2, 7],
        "parameters": {"emulators": {
            "jet_group": {"observable_list": ["jet__pt_"]},
            "groomed_group": {"observable_list": ["chjet__zg_", "chjet__tg_"]},
            "Dz_group": {"observable_list": ["jet__Dz_"]},
        }},
    }
    obs = initialize_observables_dict_from_tables(str(tmp_path), analysis_config, "exponential")

    accepted = {
        lbl for lbl in labels
        if "__hadron__" not in lbl  # hadron tables exist but no group selects them
    }
    assert set(obs["Prediction"]) == accepted
    n_features = sum(v["y"].shape[0] for v in obs["Prediction"].values())
    assert n_features == sum(nb for lbl, nb in labels.items() if lbl in accepted)
    assert n_features > 1500  # production width, not fixture width

    # design ids 0..39 minus 3 missing (none in range for n_design=40? holes are
    # 37,111,184 -> only 37 in range) minus exclusions {2,7} minus validation 30+
    ids_train = obs["Design_indices"]
    assert 2 not in ids_train and 7 not in ids_train and 37 not in ids_train
    assert obs["Design"].shape[1] == 6
    assert obs["Design"].shape[0] == len(ids_train)
    assert all(i < 30 for i in ids_train)
    assert all(30 <= i < 40 for i in obs["Design_indices_validation"])

    # every prediction column count matches the training design count
    for v in obs["Prediction"].values():
        assert v["y"].shape[1] == obs["Design"].shape[0]
        assert np.all(v["y"] > 0)


def test_append_time_series_streaming(tmp_path):
    """Chunked chain streaming: appends accumulate along axis 0, truncate_to
    drops post-checkpoint slabs, and the file reads back through the normal
    dict loader."""
    from bayesian_inference_tpu.io import hdf5

    rng = np.random.default_rng(0)
    a = rng.normal(size=(10, 4, 2))
    b = rng.normal(size=(6, 4, 2))
    n = hdf5.append_time_series(str(tmp_path), "mcmc.h5", {"chain": a})
    assert n == 10
    n = hdf5.append_time_series(str(tmp_path), "mcmc.h5", {"chain": b})
    assert n == 16
    assert hdf5.time_series_length(str(tmp_path), "mcmc.h5", "chain") == 16
    out = hdf5.read_dict_from_h5(str(tmp_path), "mcmc.h5", verbose=False)
    np.testing.assert_array_equal(out["chain"], np.concatenate([a, b], axis=0))

    # truncate back to the first slab, then append a replacement
    c = rng.normal(size=(3, 4, 2))
    n = hdf5.append_time_series(str(tmp_path), "mcmc.h5", {"chain": c}, truncate_to=10)
    assert n == 13
    out = hdf5.read_dict_from_h5(str(tmp_path), "mcmc.h5", verbose=False)
    np.testing.assert_array_equal(out["chain"], np.concatenate([a, c], axis=0))

    # modify-mode metadata writes coexist with streamed datasets
    hdf5.write_dict_to_h5({"acceptance_fraction": np.ones(4)}, str(tmp_path), "mcmc.h5", verbose=False)
    assert hdf5.time_series_length(str(tmp_path), "mcmc.h5", "chain") == 13
    assert hdf5.time_series_length(str(tmp_path), "mcmc.h5", "missing") == 0
