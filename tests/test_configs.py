"""Shipped config files parse and build stage config objects correctly."""

from pathlib import Path

import pytest

from bayesian_inference_tpu.pipeline.configs import (
    EmulationConfig,
    MCMCConfig,
    PreprocessingConfig,
    load_yaml,
)

REPO = Path(__file__).parent.parent


@pytest.mark.parametrize("name", ["jet_substructure.yaml", "example_fixture.yaml"])
def test_shipped_configs_build(name):
    path = REPO / "config" / name
    config = load_yaml(path)
    for analysis_name, analysis_config in config["analyses"].items():
        for parameterization in analysis_config["parameterizations"]:
            emu = EmulationConfig.from_config_file(
                analysis_name=analysis_name,
                parameterization=parameterization,
                config_file=str(path),
                analysis_config=analysis_config,
            )
            assert emu.emulation_groups_config
            for g in emu.emulation_groups_config.values():
                assert g.n_pc > 0
                spec = g.fit_spec(n_iters=5)
                assert spec.theta0.shape == spec.log_lo.shape

            mcmc = MCMCConfig(
                analysis_name=analysis_name,
                parameterization=parameterization,
                analysis_config=analysis_config,
                config_file=str(path),
            )
            assert mcmc.n_walkers > 0 and mcmc.n_sampling_steps > 0

            prep = PreprocessingConfig(
                analysis_name=analysis_name,
                parameterization=parameterization,
                analysis_config=analysis_config,
                config_file=str(path),
            )
            assert prep.interpolation_method in ("linear", "cubic_spline")


def test_jet_substructure_production_scale():
    """The production config carries the reference's headline scale."""
    path = REPO / "config" / "jet_substructure.yaml"
    config = load_yaml(path)
    a = config["analyses"]["analysis_jet_substructure"]
    assert a["parameters"]["mcmc"]["n_walkers"] == 100
    assert a["parameters"]["mcmc"]["n_sampling_steps"] == 50000
    n_pcs = sorted(g["n_pc"] for g in a["parameters"]["emulators"].values())
    assert n_pcs == [5, 11, 25]
