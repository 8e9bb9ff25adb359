"""Cross-cutting utilities (host-side)."""

from . import (
    cost_polynomials, flops, hdf5_io, mappings, math, misc, profiling, random_matrix,
    string,
)
from .string import format_like_list
from .profiling import OpProfile, annotate, profile_op, trace_profile
from .hdf5_io import (
    Hdf5ExportError, Hdf5FormatError, Hdf5ImportError, find_global, load,
    load_from_hdf5, load_hdf5, save, save_hdf5, save_to_hdf5,
    valid_hdf5_path_component,
)
from .math import speigs, speigsh
from .flops import compose_flops, tdot_flops
from .cost_polynomials import BigOMonomial, BigOPolynomial
from .mappings import IdentityMapping, SparseMapping
from .misc import (
    argsort, as_immutable_array, combine_constraints, combine_permutations,
    common_noncommon_rows_sorted,
    common_rows_sorted, duplicate_entries, find_row_differences, find_subclass,
    inverse_permutation, is_iterable, is_permutation, iter_common_noncommon_sorted,
    iter_common_noncommon_sorted_arrays, iter_common_sorted, iter_common_sorted_arrays,
    lexsorted, list_to_dict_list, make_grid, make_stride, np_argsort,
    permutation_as_swaps, rank_data, to_iterable,
    to_iterable_of_len, to_valid_idx, unstridify,
)
