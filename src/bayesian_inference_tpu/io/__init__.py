"""Host-side data substrate: .dat table ingest, HDF5 dict store, observable
sorting/filtering, and (design, feature) matrix assembly.

Behavioral contract mirrors the reference data_IO module
(/root/reference/src/bayesian_inference/data_IO.py) so that artifacts and
observable ordering are interchangeable; the implementation is original.
"""

from bayesian_inference_tpu.io.hdf5 import read_dict_from_h5, write_dict_to_h5
from bayesian_inference_tpu.io.observables import (
    ObservableFilter,
    data_array_from_h5,
    data_dict_from_h5,
    design_array_from_h5,
    observable_dict_from_matrix,
    observable_label_to_keys,
    observable_matrix_from_dict,
    predictions_matrix_from_h5,
    sorted_observable_list_from_dict,
)
from bayesian_inference_tpu.io.tables import initialize_observables_dict_from_tables

__all__ = [
    "ObservableFilter",
    "data_array_from_h5",
    "data_dict_from_h5",
    "design_array_from_h5",
    "initialize_observables_dict_from_tables",
    "observable_dict_from_matrix",
    "observable_label_to_keys",
    "observable_matrix_from_dict",
    "predictions_matrix_from_h5",
    "read_dict_from_h5",
    "sorted_observable_list_from_dict",
    "write_dict_to_h5",
]
