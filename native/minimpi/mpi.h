/* minimpi: a minimal, real multi-process MPI subset over Unix-domain
 * sockets — just enough surface to run the reference THUNDER binary
 * with its required >=3 ranks inside this image (which ships no MPI).
 *
 * Covered (the exact call set used by /root/reference/src + appsrc,
 * see Parallel.cpp:17-347): Init/Finalize, Comm_size/rank,
 * Comm_group/Group_incl/Group_free/Comm_create, Barrier, Bcast,
 * Allreduce(MPI_SUM, MPI_IN_PLACE), Send/Ssend/Recv, Get_count,
 * Type_size.  Deterministic in-order message matching per rank pair
 * (the reference's communication patterns are fully matched and
 * wildcard-free).
 *
 * Launch protocol: every rank is an ordinary process started with
 *   MINIMPI_SIZE=<n> MINIMPI_RANK=<i> MINIMPI_DIR=<rendezvous dir>
 * (see mpirun_mini).  Rank i binds $DIR/r<i>.sock and connects to all
 * lower ranks, forming a full mesh.
 */
#ifndef MINIMPI_MPI_H
#define MINIMPI_MPI_H

#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef int MPI_Comm;
typedef int MPI_Group;
typedef int MPI_Datatype;
typedef int MPI_Op;

typedef struct MPI_Status {
    int MPI_SOURCE;
    int MPI_TAG;
    int MPI_ERROR;
    long long count_bytes;
} MPI_Status;

#define MPI_COMM_WORLD 0
#define MPI_COMM_NULL (-1)
#define MPI_GROUP_NULL (-1)

#define MPI_DOUBLE 0
#define MPI_FLOAT 1
#define MPI_INT 2
#define MPI_LONG 3
#define MPI_C_BOOL 4
#define MPI_COMPLEX 5
#define MPI_DOUBLE_COMPLEX 6
#define MPI_CHAR 7
#define MPI_BYTE 8
#define MPI_UNSIGNED_LONG 9

#define MPI_SUM 0
#define MPI_MAX 1
#define MPI_MIN 2

#define MPI_IN_PLACE ((void*)(-1))
#define MPI_SUCCESS 0

int MPI_Init(int* argc, char*** argv);
int MPI_Finalize(void);
int MPI_Abort(MPI_Comm comm, int errorcode);
int MPI_Comm_size(MPI_Comm comm, int* size);
int MPI_Comm_rank(MPI_Comm comm, int* rank);
int MPI_Comm_group(MPI_Comm comm, MPI_Group* group);
int MPI_Group_incl(MPI_Group group, int n, const int* ranks,
                   MPI_Group* newgroup);
int MPI_Group_free(MPI_Group* group);
int MPI_Comm_create(MPI_Comm comm, MPI_Group group, MPI_Comm* newcomm);
int MPI_Comm_free(MPI_Comm* comm);
int MPI_Type_size(MPI_Datatype datatype, int* size);
int MPI_Barrier(MPI_Comm comm);
int MPI_Bcast(void* buffer, int count, MPI_Datatype datatype, int root,
              MPI_Comm comm);
int MPI_Allreduce(const void* sendbuf, void* recvbuf, int count,
                  MPI_Datatype datatype, MPI_Op op, MPI_Comm comm);
int MPI_Send(const void* buf, int count, MPI_Datatype datatype, int dest,
             int tag, MPI_Comm comm);
int MPI_Ssend(const void* buf, int count, MPI_Datatype datatype, int dest,
              int tag, MPI_Comm comm);
int MPI_Recv(void* buf, int count, MPI_Datatype datatype, int source,
             int tag, MPI_Comm comm, MPI_Status* status);
int MPI_Get_count(const MPI_Status* status, MPI_Datatype datatype,
                  int* count);
double MPI_Wtime(void);

#ifdef __cplusplus
}
#endif

#endif /* MINIMPI_MPI_H */
