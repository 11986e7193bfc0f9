// Compatibility shim: Eigen 3.5 (TF-vendored) removed MappedSparseMatrix,
// which ceres 2.0 still uses. Map<SparseMatrix> is the documented
// replacement and shares the (rows, cols, nnz, outer, inner, values)
// constructor. Force-included (-include) for the affected ceres TUs.
#pragma once
#include <Eigen/SparseCore>
namespace Eigen {
template <typename Scalar, int Options = 0, typename StorageIndex = int>
using MappedSparseMatrix = Map<SparseMatrix<Scalar, Options, StorageIndex>>;
}
