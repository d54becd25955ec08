/* Single-rank MPI stub for building reference-library harnesses.
 *
 * The image has no MPI and no network egress, so the reference binary's
 * >=3-rank topology cannot run (BASELINE.md).  This header satisfies the
 * MPI API subset used by the reference core (src/Parallel.cpp and the
 * collectives in Optimiser/Reconstructor/Model) with exact single-rank
 * semantics: rank 0 of size 1, reductions and broadcasts are identity,
 * point-to-point is never exercised on the single-rank control paths we
 * drive from the harnesses.  This unlocks golden-value generation from
 * the reference's MPI-free numerics (Projector, Reconstructor, CTF,
 * Spectrum, Mask, DirectionalStat) for parity tests.
 */
#ifndef MPI_STUB_H
#define MPI_STUB_H

#include <cstring>
#include <cstdlib>

typedef int MPI_Comm;
typedef int MPI_Group;
typedef int MPI_Op;
typedef int MPI_Request;

enum {
    MPI_COMM_NULL = -1,
    MPI_COMM_WORLD = 0,
    MPI_COMM_SELF = 1
};

/* datatypes carry their byte size for memcpy-based semantics */
typedef struct { int size; } MPI_Datatype_s;
typedef int MPI_Datatype;
enum {
    MPI_BYTE = 1,
    MPI_C_BOOL = 2,
    MPI_INT = 3,
    MPI_LONG = 4,
    MPI_FLOAT = 5,
    MPI_DOUBLE = 6,
    MPI_COMPLEX = 7,
    MPI_DOUBLE_COMPLEX = 8,
    MPI_CHAR = 9,
    MPI_UNSIGNED = 10,
    MPI_UNSIGNED_LONG = 11
};

enum { MPI_SUM = 1, MPI_MAX = 2, MPI_MIN = 3, MPI_LAND = 4, MPI_BAND = 5 };

#define MPI_IN_PLACE ((void *) -1)
#define MPI_SUCCESS 0

typedef struct { int MPI_SOURCE; int MPI_TAG; int count_bytes; } MPI_Status;
#define MPI_STATUS_IGNORE ((MPI_Status *) 0)

static inline int MPI_Type_size(MPI_Datatype t, int *size) {
    switch (t) {
        case MPI_BYTE: case MPI_C_BOOL: case MPI_CHAR: *size = 1; break;
        case MPI_INT: case MPI_FLOAT: case MPI_UNSIGNED: *size = 4; break;
        case MPI_LONG: case MPI_DOUBLE: case MPI_COMPLEX:
        case MPI_UNSIGNED_LONG: *size = 8; break;
        case MPI_DOUBLE_COMPLEX: *size = 16; break;
        default: *size = 1; break;
    }
    return MPI_SUCCESS;
}

static inline int MPI_Init(int *, char ***) { return MPI_SUCCESS; }
static inline int MPI_Finalize(void) { return MPI_SUCCESS; }
static inline int MPI_Abort(MPI_Comm, int code) { std::exit(code); }
/* Report rank 1 (HEMI_A_LEAD, Parallel.h:47) of size 2: the reference
 * gates all compute off the master rank (IF_MASTER return), so a
 * single-process harness must present itself as a hemisphere lead.
 * All collectives remain identity, so the numerics are exact. */
static inline int MPI_Comm_rank(MPI_Comm, int *rank) { *rank = 1; return 0; }
static inline int MPI_Comm_size(MPI_Comm, int *size) { *size = 2; return 0; }
static inline int MPI_Barrier(MPI_Comm) { return MPI_SUCCESS; }
static inline int MPI_Bcast(void *, int, MPI_Datatype, int, MPI_Comm) {
    return MPI_SUCCESS;
}
static inline int MPI_Allreduce(const void *src, void *dst, int n,
                                MPI_Datatype t, MPI_Op, MPI_Comm) {
    if (src != MPI_IN_PLACE && src != dst) {
        int es; MPI_Type_size(t, &es);
        std::memcpy(dst, src, (size_t) n * es);
    }
    return MPI_SUCCESS;
}
static inline int MPI_Reduce(const void *src, void *dst, int n,
                             MPI_Datatype t, MPI_Op, int, MPI_Comm) {
    if (src != MPI_IN_PLACE && src != dst) {
        int es; MPI_Type_size(t, &es);
        std::memcpy(dst, src, (size_t) n * es);
    }
    return MPI_SUCCESS;
}
/* point-to-point: never legitimately reached with one rank */
static inline int MPI_Send(const void *, int, MPI_Datatype, int, int,
                           MPI_Comm) { return MPI_SUCCESS; }
static inline int MPI_Ssend(const void *, int, MPI_Datatype, int, int,
                            MPI_Comm) { return MPI_SUCCESS; }
static inline int MPI_Recv(void *, int, MPI_Datatype, int, int, MPI_Comm,
                           MPI_Status *st) {
    if (st) { st->MPI_SOURCE = 0; st->MPI_TAG = 0; st->count_bytes = 0; }
    return MPI_SUCCESS;
}
static inline int MPI_Get_count(const MPI_Status *st, MPI_Datatype t,
                                int *count) {
    int es; MPI_Type_size(t, &es);
    *count = st ? st->count_bytes / es : 0;
    return MPI_SUCCESS;
}
static inline int MPI_Comm_group(MPI_Comm c, MPI_Group *g) {
    *g = c; return MPI_SUCCESS;
}
static inline int MPI_Group_incl(MPI_Group g, int, const int *,
                                 MPI_Group *out) { *out = g; return 0; }
static inline int MPI_Comm_create(MPI_Comm c, MPI_Group, MPI_Comm *out) {
    *out = c; return MPI_SUCCESS;
}
static inline int MPI_Group_free(MPI_Group *) { return MPI_SUCCESS; }
static inline int MPI_Comm_free(MPI_Comm *) { return MPI_SUCCESS; }
static inline double MPI_Wtime(void) { return 0.0; }

#endif /* MPI_STUB_H */
