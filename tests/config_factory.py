"""Factory for reference-schema analysis YAMLs over the bundled fixture.

Used by the test suite (via conftest) and by scripts/parity_check.py. Keep this
module import-safe: no jax configuration side effects.
"""

import shutil
from pathlib import Path

import yaml

_DATA_DIR = Path(__file__).parent / "test_data"

# Exponential-parameterization prior box from the reference YAML schema.
_EXP_MIN = [0.1, 1, 0.006737946999085467, 0.006737946999085467, 0, 0.049787068367863944]
_EXP_MAX = [0.5, 10, 10, 10, 1.5, 100]


def make_analysis_yaml(
    tmp_path: Path,
    groups: dict[str, dict] | None = None,
    n_walkers: int = 16,
    n_burn_steps: int = 20,
    n_sampling_steps: int = 40,
    analysis_name: str = "analysis_test",
    n_restarts: int = 2,
    copy_observables: bool = True,
    observables_filename: str = "observables.h5",
) -> tuple[Path, str, str]:
    """Write a reference-schema YAML pointing at the fixture data, and stage
    observables.h5 into the output dir. Returns (config_path, analysis_name, parameterization)."""
    if groups is None:
        groups = {
            "group_ch": {"n_pc": 2, "observable_list": ["pt_ch_"]},
            "group_pi": {"n_pc": 2, "observable_list": ["pt_pi"]},
        }
    emulators = {}
    for name, g in groups.items():
        emulators[name] = {
            "force_retrain": False,
            "n_pc": g["n_pc"],
            "max_n_components_to_calculate": g.get("max_n_components_to_calculate", 30),
            "kernels": {
                "active": ["matern", "noise"],
                "matern": {"nu": 1.5, "length_scale_bounds_factor": [0.01, 100]},
                "rbf": {"length_scale_bounds_factor": [0.01, 100]},
                "noise": {"type": "white", "args": {"noise_level": 0.25, "noise_level_bounds": [0.0001, 1]}},
            },
            "GPR": {"n_restarts": n_restarts, "alpha": 1.0e-10},
            "observable_list": g["observable_list"],
            **({"observable_exclude_list": g["observable_exclude_list"]} if "observable_exclude_list" in g else {}),
            **({"cross_validation": g["cross_validation"]} if "cross_validation" in g else {}),
            **({"cross_validation_k": g["cross_validation_k"]} if "cross_validation_k" in g else {}),
        }

    parameterization = "exponential"
    config = {
        "output_dir": str(tmp_path / "output"),
        "initialize_observables": False,
        "preprocess_input_data": False,
        "fit_emulators": True,
        "run_mcmc": True,
        "run_closure_tests": False,
        "plot": {"input_data": False, "emulators": False, "mcmc": False, "qhat": False,
                 "closure_tests": False, "across_analyses": False},
        "observable_table_dir": str(_DATA_DIR / "tables"),
        "observable_config_dir": str(_DATA_DIR),
        "observables_filename": observables_filename,
        "analyses": {
            analysis_name: {
                "parameterizations": [parameterization],
                "sqrts_list": [200, 2760, 5020],
                "centrality_range": [0, 10],
                "parameterization": {
                    parameterization: {
                        "names": ["alpha_s", "Q0", "c_1", "c_2", "tau_0", "c_3"],
                        "min": _EXP_MIN,
                        "max": _EXP_MAX,
                    }
                },
                "validation_indices": [200, 230],
                "parameters": {
                    "preprocessing": {
                        "smoothing": {
                            "outlier_n_RMS": 2.0,
                            "interpolation_method": "linear",
                            "max_n_feature_outliers_to_interpolate": 2,
                        }
                    },
                    "emulators": emulators,
                    "mcmc": {
                        "n_walkers": n_walkers,
                        "n_burn_steps": n_burn_steps,
                        "n_sampling_steps": n_sampling_steps,
                        "n_logging_steps": 100,
                    },
                    "closure": {"confidence": 0.9},
                },
            }
        },
    }
    config_path = tmp_path / "analysis.yaml"
    config_path.write_text(yaml.safe_dump(config))

    if copy_observables:
        run_dir = tmp_path / "output" / f"{analysis_name}_{parameterization}"
        run_dir.mkdir(parents=True, exist_ok=True)
        shutil.copy(_DATA_DIR / "observables.h5", run_dir / "observables.h5")
    return config_path, analysis_name, parameterization
