# Shim Eigen3 CMake config: no system Eigen in this image; TensorFlow vendors
# Eigen 3.5.0 headers which Ceres/OpenCV-interop accept.
set(EIGEN3_ROOT "/opt/venv/lib/python3.12/site-packages/tensorflow/include")
set(EIGEN3_INCLUDE_DIR "${EIGEN3_ROOT}")
set(EIGEN3_INCLUDE_DIRS "${EIGEN3_ROOT}")
set(EIGEN3_FOUND TRUE)
set(Eigen3_FOUND TRUE)
set(EIGEN3_VERSION "3.5.0")
set(EIGEN3_VERSION_STRING "3.5.0")
set(Eigen3_VERSION "3.5.0")
if(NOT TARGET Eigen3::Eigen)
  add_library(Eigen3::Eigen INTERFACE IMPORTED)
  set_target_properties(Eigen3::Eigen PROPERTIES
    INTERFACE_INCLUDE_DIRECTORIES "${EIGEN3_ROOT}")
endif()
