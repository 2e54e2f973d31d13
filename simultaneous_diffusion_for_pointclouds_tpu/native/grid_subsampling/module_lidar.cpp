// Separate translation unit for the lidar-policy module so setuptools
// never reuses the barycenter build's object file.
#define GRID_SUBSAMPLING_LIDAR 1
#include "module.cpp"
