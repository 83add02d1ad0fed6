// Minimal hand-written declarations of the stable HDF5 1.10 C ABI.
//
// This image ships the HDF5 runtime (libhdf5_serial.so.103, 1.10.8) but not
// the development headers, so the framework's native I/O layer declares the
// small public-ABI subset it needs.  Types and enum values follow the
// documented, versioned HDF5 1.10 ABI (hid_t widened to 64-bit in 1.10).
//
// Role parity: the reference links against full libhdf5 headers from its
// C++ layer (/root/reference/hdf5/hdf5.cc); this file is our equivalent
// contract with the same shared library.
#pragma once

#include <cstddef>
#include <cstdint>

extern "C" {

typedef int64_t hid_t;
typedef int herr_t;
typedef unsigned long long hsize_t;
typedef int htri_t;

// --- constants -----------------------------------------------------------
static const hid_t H5P_DEFAULT = 0;
static const unsigned H5F_ACC_RDONLY = 0u;
static const unsigned H5F_ACC_RDWR = 1u;
static const unsigned H5F_ACC_TRUNC = 2u;
static const hid_t H5S_ALL = 0;
static const hid_t H5E_DEFAULT = 0;

// H5T_class_t (subset)
enum H5T_class_abi { H5T_COMPOUND_ABI = 6 };

// H5_index_t / H5_iter_order_t
enum { H5_INDEX_NAME = 0 };
enum { H5_ITER_INC = 0, H5_ITER_NATIVE = 2 };

// --- global type / property-class ids (versioned data symbols) ------------
extern hid_t H5T_NATIVE_DOUBLE_g;
extern hid_t H5T_NATIVE_FLOAT_g;
extern hid_t H5T_NATIVE_LLONG_g;   // int64 on LP64
extern hid_t H5T_NATIVE_INT_g;
extern hid_t H5P_CLS_LINK_CREATE_ID_g;

// --- library -------------------------------------------------------------
herr_t H5open(void);
herr_t H5Eset_auto2(hid_t estack, void *func, void *client_data);

// --- files ---------------------------------------------------------------
hid_t H5Fcreate(const char *name, unsigned flags, hid_t fcpl, hid_t fapl);
hid_t H5Fopen(const char *name, unsigned flags, hid_t fapl);
herr_t H5Fclose(hid_t f);

// --- groups --------------------------------------------------------------
hid_t H5Gopen2(hid_t loc, const char *name, hid_t gapl);
herr_t H5Gclose(hid_t g);

// --- links (iteration) -----------------------------------------------------
// We only read the name from the callback; the info struct is opaque here.
typedef herr_t (*H5L_iterate_t)(hid_t group, const char *name,
                                const void *info, void *op_data);
herr_t H5Literate(hid_t grp, int idx_type, int order, hsize_t *idx,
                  H5L_iterate_t op, void *op_data);

// --- dataspaces ------------------------------------------------------------
hid_t H5Screate_simple(int rank, const hsize_t *dims, const hsize_t *maxdims);
herr_t H5Sclose(hid_t s);
int H5Sget_simple_extent_ndims(hid_t s);
int H5Sget_simple_extent_dims(hid_t s, hsize_t *dims, hsize_t *maxdims);

// H5S_seloper_t (subset)
enum { H5S_SELECT_SET_ABI = 0 };
herr_t H5Sselect_hyperslab(hid_t space, int seloper, const hsize_t *start,
                           const hsize_t *stride, const hsize_t *count,
                           const hsize_t *block);

// --- datatypes -------------------------------------------------------------
hid_t H5Tcreate(int cls, size_t size);
herr_t H5Tinsert(hid_t parent, const char *name, size_t offset, hid_t member);
herr_t H5Tclose(hid_t t);

// --- property lists ---------------------------------------------------------
hid_t H5Pcreate(hid_t cls_id);
herr_t H5Pclose(hid_t p);
herr_t H5Pset_create_intermediate_group(hid_t lcpl, unsigned yes);

// --- datasets ---------------------------------------------------------------
hid_t H5Dopen2(hid_t loc, const char *name, hid_t dapl);
hid_t H5Dcreate2(hid_t loc, const char *name, hid_t type, hid_t space,
                 hid_t lcpl, hid_t dcpl, hid_t dapl);
herr_t H5Dclose(hid_t d);
hid_t H5Dget_space(hid_t d);
herr_t H5Dread(hid_t d, hid_t memtype, hid_t memspace, hid_t filespace,
               hid_t xfer, void *buf);
herr_t H5Dwrite(hid_t d, hid_t memtype, hid_t memspace, hid_t filespace,
                hid_t xfer, const void *buf);

}  // extern "C"
