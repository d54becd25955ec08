/* minimpi implementation: full-mesh Unix-domain sockets, blocking
 * in-order message matching, rank-0-of-communicator-rooted collectives.
 * See mpi.h for scope.  C99, no dependencies; compiles as C or C++.
 */
#include "mpi.h"

#include <errno.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <sys/socket.h>
#include <sys/time.h>
#include <sys/un.h>
#include <unistd.h>

#define MAX_COMMS 16
#define MAX_GROUPS 16
#define MAX_RANKS 64

typedef struct {
    int n;
    int ranks[MAX_RANKS]; /* world ranks, comm rank = index */
} RankList;

static int g_size = -1;
static int g_rank = -1;
static int g_fd[MAX_RANKS];       /* socket fd per peer world rank */
static RankList g_comms[MAX_COMMS];
static int g_n_comms = 0;
static RankList g_groups[MAX_GROUPS];
static int g_n_groups = 0;

static void die(const char* msg)
{
    fprintf(stderr, "minimpi[rank %d]: %s (errno %d: %s)\n", g_rank, msg,
            errno, strerror(errno));
    exit(1);
}

static void write_all(int fd, const void* buf, size_t n)
{
    const char* p = (const char*)buf;
    while (n) {
        ssize_t k = write(fd, p, n);
        if (k < 0) {
            if (errno == EINTR) continue;
            die("write");
        }
        p += k;
        n -= (size_t)k;
    }
}

static void read_all(int fd, void* buf, size_t n)
{
    char* p = (char*)buf;
    while (n) {
        ssize_t k = read(fd, p, n);
        if (k < 0) {
            if (errno == EINTR) continue;
            die("read");
        }
        if (k == 0) die("peer closed");
        p += k;
        n -= (size_t)k;
    }
}

typedef struct {
    int tag;
    long long nbytes;
} MsgHeader;

static void send_msg(int world_dst, int tag, const void* buf,
                     long long nbytes)
{
    MsgHeader h;
    h.tag = tag;
    h.nbytes = nbytes;
    write_all(g_fd[world_dst], &h, sizeof h);
    write_all(g_fd[world_dst], buf, (size_t)nbytes);
}

static long long recv_msg(int world_src, int tag, void* buf,
                          long long max_bytes)
{
    MsgHeader h;
    read_all(g_fd[world_src], &h, sizeof h);
    if (h.tag != tag) {
        fprintf(stderr,
                "minimpi[rank %d]: tag mismatch from %d: got %d want %d\n",
                g_rank, world_src, h.tag, tag);
        exit(1);
    }
    if (h.nbytes > max_bytes) die("message larger than recv buffer");
    read_all(g_fd[world_src], buf, (size_t)h.nbytes);
    return h.nbytes;
}

static const char* sock_path(char* out, size_t cap, int rank)
{
    const char* dir = getenv("MINIMPI_DIR");
    if (!dir) die("MINIMPI_DIR not set");
    snprintf(out, cap, "%s/r%d.sock", dir, rank);
    return out;
}

int MPI_Init(int* argc, char*** argv)
{
    (void)argc;
    (void)argv;
    const char* s = getenv("MINIMPI_SIZE");
    const char* r = getenv("MINIMPI_RANK");
    if (!s || !r) die("MINIMPI_SIZE / MINIMPI_RANK not set");
    g_size = atoi(s);
    g_rank = atoi(r);
    if (g_size < 1 || g_size > MAX_RANKS || g_rank < 0 || g_rank >= g_size)
        die("bad rank/size");
    for (int i = 0; i < MAX_RANKS; i++) g_fd[i] = -1;

    char path[512];
    int listen_fd = socket(AF_UNIX, SOCK_STREAM, 0);
    if (listen_fd < 0) die("socket");
    struct sockaddr_un addr;
    memset(&addr, 0, sizeof addr);
    addr.sun_family = AF_UNIX;
    sock_path(path, sizeof path, g_rank);
    strncpy(addr.sun_path, path, sizeof addr.sun_path - 1);
    unlink(path);
    if (bind(listen_fd, (struct sockaddr*)&addr, sizeof addr) < 0)
        die("bind");
    if (listen(listen_fd, g_size) < 0) die("listen");

    /* connect to all lower ranks (retrying until their socket exists) */
    for (int peer = 0; peer < g_rank; peer++) {
        int fd = socket(AF_UNIX, SOCK_STREAM, 0);
        if (fd < 0) die("socket");
        struct sockaddr_un pa;
        memset(&pa, 0, sizeof pa);
        pa.sun_family = AF_UNIX;
        sock_path(path, sizeof path, peer);
        strncpy(pa.sun_path, path, sizeof pa.sun_path - 1);
        for (int tries = 0;; tries++) {
            if (connect(fd, (struct sockaddr*)&pa, sizeof pa) == 0) break;
            if (tries > 30000) die("connect timeout");
            usleep(1000);
        }
        unsigned char me = (unsigned char)g_rank;
        write_all(fd, &me, 1);
        g_fd[peer] = fd;
    }
    /* accept from all higher ranks */
    for (int k = g_rank + 1; k < g_size; k++) {
        int fd = accept(listen_fd, NULL, NULL);
        if (fd < 0) die("accept");
        unsigned char who;
        read_all(fd, &who, 1);
        g_fd[who] = fd;
    }
    close(listen_fd);

    /* MPI_COMM_WORLD */
    g_comms[0].n = g_size;
    for (int i = 0; i < g_size; i++) g_comms[0].ranks[i] = i;
    g_n_comms = 1;
    g_n_groups = 0;
    return MPI_SUCCESS;
}

int MPI_Finalize(void)
{
    MPI_Barrier(MPI_COMM_WORLD);
    for (int i = 0; i < g_size; i++)
        if (g_fd[i] >= 0) close(g_fd[i]);
    return MPI_SUCCESS;
}

int MPI_Abort(MPI_Comm comm, int errorcode)
{
    (void)comm;
    exit(errorcode);
}

static RankList* comm_of(MPI_Comm comm)
{
    if (comm < 0 || comm >= g_n_comms) die("bad communicator");
    return &g_comms[comm];
}

int MPI_Comm_size(MPI_Comm comm, int* size)
{
    *size = comm_of(comm)->n;
    return MPI_SUCCESS;
}

int MPI_Comm_rank(MPI_Comm comm, int* rank)
{
    RankList* c = comm_of(comm);
    *rank = -1;
    for (int i = 0; i < c->n; i++)
        if (c->ranks[i] == g_rank) *rank = i;
    return MPI_SUCCESS;
}

int MPI_Comm_group(MPI_Comm comm, MPI_Group* group)
{
    if (g_n_groups >= MAX_GROUPS) g_n_groups = 0; /* freed slots recycle */
    g_groups[g_n_groups] = *comm_of(comm);
    *group = g_n_groups++;
    return MPI_SUCCESS;
}

int MPI_Group_incl(MPI_Group group, int n, const int* ranks,
                   MPI_Group* newgroup)
{
    if (group < 0 || group >= g_n_groups) die("bad group");
    if (g_n_groups >= MAX_GROUPS) die("too many groups");
    RankList* src = &g_groups[group];
    RankList* dst = &g_groups[g_n_groups];
    dst->n = n;
    for (int i = 0; i < n; i++) {
        if (ranks[i] < 0 || ranks[i] >= src->n) die("bad group rank");
        dst->ranks[i] = src->ranks[ranks[i]];
    }
    *newgroup = g_n_groups++;
    return MPI_SUCCESS;
}

int MPI_Group_free(MPI_Group* group)
{
    *group = MPI_GROUP_NULL;
    return MPI_SUCCESS;
}

int MPI_Comm_create(MPI_Comm comm, MPI_Group group, MPI_Comm* newcomm)
{
    (void)comm;
    if (group < 0 || group >= g_n_groups) die("bad group");
    if (g_n_comms >= MAX_COMMS) die("too many communicators");
    RankList* g = &g_groups[group];
    int member = 0;
    for (int i = 0; i < g->n; i++)
        if (g->ranks[i] == g_rank) member = 1;
    /* every process allocates the slot so comm handles agree globally */
    g_comms[g_n_comms] = *g;
    int handle = g_n_comms++;
    *newcomm = member ? handle : MPI_COMM_NULL;
    return MPI_SUCCESS;
}

int MPI_Comm_free(MPI_Comm* comm)
{
    *comm = MPI_COMM_NULL;
    return MPI_SUCCESS;
}

int MPI_Type_size(MPI_Datatype datatype, int* size)
{
    switch (datatype) {
    case MPI_DOUBLE: *size = 8; break;
    case MPI_FLOAT: *size = 4; break;
    case MPI_INT: *size = 4; break;
    case MPI_LONG: *size = 8; break;
    case MPI_UNSIGNED_LONG: *size = 8; break;
    case MPI_C_BOOL: *size = 1; break;
    case MPI_COMPLEX: *size = 8; break;
    case MPI_DOUBLE_COMPLEX: *size = 16; break;
    case MPI_CHAR: *size = 1; break;
    case MPI_BYTE: *size = 1; break;
    default: die("bad datatype");
    }
    return MPI_SUCCESS;
}

/* collective tags live in a reserved negative space so they can never
 * collide with the reference's p2p tags (all >= 0) */
#define TAG_BARRIER (-101)
#define TAG_BCAST (-102)
#define TAG_REDUCE_UP (-103)
#define TAG_REDUCE_DOWN (-104)

int MPI_Barrier(MPI_Comm comm)
{
    if (comm == MPI_COMM_NULL) return MPI_SUCCESS;
    RankList* c = comm_of(comm);
    if (c->n <= 1) return MPI_SUCCESS;
    int root = c->ranks[0];
    char tok = 0;
    if (g_rank == root) {
        for (int i = 1; i < c->n; i++)
            recv_msg(c->ranks[i], TAG_BARRIER, &tok, 1);
        for (int i = 1; i < c->n; i++)
            send_msg(c->ranks[i], TAG_BARRIER, &tok, 1);
    } else {
        send_msg(root, TAG_BARRIER, &tok, 1);
        recv_msg(root, TAG_BARRIER, &tok, 1);
    }
    return MPI_SUCCESS;
}

int MPI_Bcast(void* buffer, int count, MPI_Datatype datatype, int root,
              MPI_Comm comm)
{
    if (comm == MPI_COMM_NULL) return MPI_SUCCESS;
    RankList* c = comm_of(comm);
    int ts;
    MPI_Type_size(datatype, &ts);
    long long nbytes = (long long)count * ts;
    int root_world = c->ranks[root];
    if (g_rank == root_world) {
        for (int i = 0; i < c->n; i++)
            if (c->ranks[i] != g_rank)
                send_msg(c->ranks[i], TAG_BCAST, buffer, nbytes);
    } else {
        recv_msg(root_world, TAG_BCAST, buffer, nbytes);
    }
    return MPI_SUCCESS;
}

static void reduce_accum(void* acc, const void* in, int count,
                         MPI_Datatype dt, MPI_Op op)
{
    if (op != MPI_SUM) die("only MPI_SUM implemented");
    switch (dt) {
    case MPI_DOUBLE: {
        double* a = (double*)acc;
        const double* b = (const double*)in;
        for (int i = 0; i < count; i++) a[i] += b[i];
        break;
    }
    case MPI_FLOAT: {
        float* a = (float*)acc;
        const float* b = (const float*)in;
        for (int i = 0; i < count; i++) a[i] += b[i];
        break;
    }
    case MPI_INT: {
        int* a = (int*)acc;
        const int* b = (const int*)in;
        for (int i = 0; i < count; i++) a[i] += b[i];
        break;
    }
    case MPI_LONG: {
        long* a = (long*)acc;
        const long* b = (const long*)in;
        for (int i = 0; i < count; i++) a[i] += b[i];
        break;
    }
    case MPI_UNSIGNED_LONG: {
        unsigned long* a = (unsigned long*)acc;
        const unsigned long* b = (const unsigned long*)in;
        for (int i = 0; i < count; i++) a[i] += b[i];
        break;
    }
    case MPI_C_BOOL: {
        /* bool + bool == logical or, the only sane SUM semantics */
        char* a = (char*)acc;
        const char* b = (const char*)in;
        for (int i = 0; i < count; i++) a[i] = (char)(a[i] || b[i]);
        break;
    }
    case MPI_COMPLEX: {
        float* a = (float*)acc;
        const float* b = (const float*)in;
        for (int i = 0; i < 2 * count; i++) a[i] += b[i];
        break;
    }
    case MPI_DOUBLE_COMPLEX: {
        double* a = (double*)acc;
        const double* b = (const double*)in;
        for (int i = 0; i < 2 * count; i++) a[i] += b[i];
        break;
    }
    default: die("bad datatype in reduce");
    }
}

int MPI_Allreduce(const void* sendbuf, void* recvbuf, int count,
                  MPI_Datatype datatype, MPI_Op op, MPI_Comm comm)
{
    if (comm == MPI_COMM_NULL) return MPI_SUCCESS;
    RankList* c = comm_of(comm);
    int ts;
    MPI_Type_size(datatype, &ts);
    long long nbytes = (long long)count * ts;
    if (sendbuf != MPI_IN_PLACE) memcpy(recvbuf, sendbuf, (size_t)nbytes);
    if (c->n <= 1) return MPI_SUCCESS;
    int root = c->ranks[0];
    if (g_rank == root) {
        char* tmp = (char*)malloc((size_t)nbytes);
        if (!tmp) die("malloc");
        for (int i = 1; i < c->n; i++) {
            recv_msg(c->ranks[i], TAG_REDUCE_UP, tmp, nbytes);
            reduce_accum(recvbuf, tmp, count, datatype, op);
        }
        free(tmp);
        for (int i = 1; i < c->n; i++)
            send_msg(c->ranks[i], TAG_REDUCE_DOWN, recvbuf, nbytes);
    } else {
        send_msg(root, TAG_REDUCE_UP, recvbuf, nbytes);
        recv_msg(root, TAG_REDUCE_DOWN, recvbuf, nbytes);
    }
    return MPI_SUCCESS;
}

int MPI_Send(const void* buf, int count, MPI_Datatype datatype, int dest,
             int tag, MPI_Comm comm)
{
    RankList* c = comm_of(comm);
    int ts;
    MPI_Type_size(datatype, &ts);
    send_msg(c->ranks[dest], tag, buf, (long long)count * ts);
    return MPI_SUCCESS;
}

int MPI_Ssend(const void* buf, int count, MPI_Datatype datatype, int dest,
              int tag, MPI_Comm comm)
{
    return MPI_Send(buf, count, datatype, dest, tag, comm);
}

int MPI_Recv(void* buf, int count, MPI_Datatype datatype, int source,
             int tag, MPI_Comm comm, MPI_Status* status)
{
    RankList* c = comm_of(comm);
    int ts;
    MPI_Type_size(datatype, &ts);
    long long got =
        recv_msg(c->ranks[source], tag, buf, (long long)count * ts);
    if (status) {
        status->MPI_SOURCE = source;
        status->MPI_TAG = tag;
        status->MPI_ERROR = 0;
        status->count_bytes = got;
    }
    return MPI_SUCCESS;
}

int MPI_Get_count(const MPI_Status* status, MPI_Datatype datatype,
                  int* count)
{
    int ts;
    MPI_Type_size(datatype, &ts);
    *count = (int)(status->count_bytes / ts);
    return MPI_SUCCESS;
}

double MPI_Wtime(void)
{
    struct timeval tv;
    gettimeofday(&tv, NULL);
    return tv.tv_sec + 1e-6 * tv.tv_usec;
}
