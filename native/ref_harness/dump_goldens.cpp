/* Golden-value generator: drives the REFERENCE library (built in place
 * at /root/reference against the single-rank MPI stub in mpi.h) and
 * dumps raw binary arrays for thunder-tpu's parity tests.
 *
 * The full reference binary needs >=3 MPI ranks (appsrc/thunder.cpp:
 * 401-409) and no MPI exists in this image, but the numerics under it —
 * Projector (Projector.cpp), Reconstructor (Reconstructor.cpp), CTF
 * (CTF.cpp), FSC (Spectrum.cpp:302), gridding kernels (Functions.cpp:
 * 105-241) — are MPI-free or exact at one rank, so their outputs are
 * directly comparable.
 *
 * Output: tests/goldens/<name>.bin (float32/complex64 row-major) plus a
 * manifest line per dump on stdout.
 */

#include <mpi.h>

#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <unistd.h>
#include <cmath>
#include <vector>
#include <string>

#include "Projector.h"
#include "Reconstructor.h"
#include "CTF.h"
#include "Postprocess.h"
#include "FFT.h"
#include "Functions/Spectrum.h"
#include "Functions/Functions.h"
#include "Geometry/Euler.h"
#include "Geometry/Symmetry.h"
#include "Logging.h"

_INITIALIZE_EASYLOGGINGPP

static std::string g_dir = "tests/goldens";

static void dumpF32(const char* name, const float* data, size_t n)
{
    std::string p = g_dir + "/" + name + ".bin";
    FILE* f = fopen(p.c_str(), "wb");
    fwrite(data, sizeof(float), n, f);
    fclose(f);
    printf("dump %s float32 %zu\n", name, n);
}

static void dumpC64(const char* name, const std::vector<Complex>& v)
{
    std::vector<float> out(v.size() * 2);
    for (size_t i = 0; i < v.size(); i++) {
        out[2 * i] = (float) REAL(v[i]);
        out[2 * i + 1] = (float) IMAG(v[i]);
    }
    std::string p = g_dir + "/" + name + ".bin";
    FILE* f = fopen(p.c_str(), "wb");
    fwrite(out.data(), sizeof(float), out.size(), f);
    fclose(f);
    printf("dump %s complex64 %zu\n", name, v.size());
}

/* analytic phantom over centered coordinates (x, y, z) */
static double phantomVal(double x, double y, double z)
{
    double g1 = exp(-((x - 3) * (x - 3) + y * y + z * z) / (2 * 6.25));
    double g2 = exp(-((x + 2) * (x + 2) + (y - 2) * (y - 2) + z * z) / 8.0);
    double g3 = exp(-(x * x + (y + 3) * (y + 3) + (z - 2) * (z - 2)) / 4.5);
    return g1 + g2 + g3;
}

int main(int argc, char* argv[])
{
    if (argc > 1) g_dir = argv[1];
    loggerInit(argc, argv);

    const int N = 32;
    const unsigned int nt = 1;

    /* ---- phantom volume ------------------------------------------- */
    Volume vol(N, N, N, RL_SPACE);
    for (int k = -N / 2; k < N / 2; k++)
        for (int j = -N / 2; j < N / 2; j++)
            for (int i = -N / 2; i < N / 2; i++)
                vol.setRL((RFLOAT) phantomVal(i, j, k), i, j, k);

    {
        std::vector<float> buf;
        buf.reserve((size_t) N * N * N);
        for (int k = -N / 2; k < N / 2; k++)
            for (int j = -N / 2; j < N / 2; j++)
                for (int i = -N / 2; i < N / 2; i++)
                    buf.push_back((float) vol.getRL(i, j, k));
        dumpF32("phantom_32", buf.data(), buf.size());
    }

    Volume volFT = vol.copyVolume();
    {
        FFT fft;
        fft.fw(volFT, nt);
    }

    /* ---- projector slices (Projector.cpp:123-148, :356-374) ------- */
    const double quats[3][4] = {
        {1.0, 0.0, 0.0, 0.0},
        {0.96592583, 0.14644661, 0.14644661, 0.17677670},
        {0.81, -0.31, 0.41, 0.29},
    };
    {
        Projector proj;
        proj.setMaxRadius(N / 2 - 1);
        proj.setPf(2);
        proj.setInterp(LINEAR_INTERP);
        proj.setProjectee(volFT.copyVolume(), nt);

        std::vector<Complex> all;
        for (int q = 0; q < 3; q++) {
            dvec4 qv(quats[q][0], quats[q][1], quats[q][2], quats[q][3]);
            qv /= qv.norm();
            dmat33 rot;
            rotate3D(rot, qv);
            Image img(N, N, FT_SPACE);
            proj.project(img, rot, nt);
            for (int j = -N / 2; j < N / 2; j++)
                for (int i = -N / 2; i < N / 2; i++)
                    all.push_back(img.getFT(i, j));
        }
        dumpC64("proj_slices_32", all);
    }

    /* ---- CTF image (CTF.cpp:11-151) ------------------------------- */
    {
        Image ctf(N, N, FT_SPACE);
        CTF(ctf, 1.32, 300000, 20000, 18000, 0.3, 2e7, 0.1, 0.2, nt);
        std::vector<Complex> buf;
        for (int j = -N / 2; j < N / 2; j++)
            for (int i = -N / 2; i < N / 2; i++)
                buf.push_back(ctf.getFT(i, j));
        dumpC64("ctf_32", buf);
    }

    /* ---- FSC (Spectrum.cpp:302-337) ------------------------------- */
    {
        Volume a = vol.copyVolume();
        Volume b(N, N, N, RL_SPACE);
        for (int k = -N / 2; k < N / 2; k++)
            for (int j = -N / 2; j < N / 2; j++)
                for (int i = -N / 2; i < N / 2; i++) {
                    double pert = 0.1 * sin(0.7 * i + 1.3 * j - 0.4 * k);
                    b.setRL(a.getRL(i, j, k) + (RFLOAT) pert, i, j, k);
                }
        FFT fft;
        fft.fw(a, nt);
        fft.fw(b, nt);
        vec fsc(N / 2);
        FSC(fsc, a, b, 1);
        std::vector<float> out(N / 2);
        for (int i = 0; i < N / 2; i++) out[i] = (float) fsc(i);
        dumpF32("fsc_32", out.data(), out.size());
    }

    /* ---- gridding kernels (Functions.cpp:105-241) ----------------- */
    {
        std::vector<float> out;
        for (int i = 0; i <= 64; i++) {
            double r = i / 64.0;                  /* within support */
            out.push_back((float) MKB_FT(r * 1.9, 1.9, 15.0));
            out.push_back((float) MKB_RL(r * 0.5, 1.9, 15.0));
            out.push_back((float) TIK_RL(r * 0.5));
            out.push_back((float) NIK_RL(r * 0.5));
        }
        dumpF32("kernels", out.data(), out.size());
    }

    /* ---- reconstructor round-trip (Reconstructor.cpp:569-1831) ---- */
    {
        Symmetry sym("C1");
        Reconstructor recon(MODE_3D, N, N, 2, &sym, 1.9, 15);
        recon.setMPIEnv();
        recon.allocSpace(nt);
        recon.setMaxRadius(N / 2 - 1);

        Projector proj;
        proj.setMaxRadius(N / 2 - 1);
        proj.setPf(2);
        proj.setInterp(LINEAR_INTERP);
        proj.setProjectee(volFT.copyVolume(), nt);

        Image ctf(N, N, FT_SPACE);
        SET_1_FT(ctf);

        /* deterministic rotation set */
        for (int s = 0; s < 60; s++) {
            double t0 = 0.37 * s + 0.11;
            double t1 = 0.53 * s + 0.71;
            double t2 = 0.29 * s + 1.31;
            dvec4 qv(cos(t0), sin(t0) * cos(t1),
                     sin(t0) * sin(t1) * cos(t2),
                     sin(t0) * sin(t1) * sin(t2));
            qv /= qv.norm();
            dmat33 rot;
            rotate3D(rot, qv);
            Image img(N, N, FT_SPACE);
            proj.project(img, rot, nt);
            recon.insert(img, ctf, rot, 1);
        }
        recon.prepareTF(nt);
        recon.setMAP(false);
        Volume out;
        recon.reconstruct(out, nt);

        std::vector<float> buf;
        for (int k = -N / 2; k < N / 2; k++)
            for (int j = -N / 2; j < N / 2; j++)
                for (int i = -N / 2; i < N / 2; i++)
                    buf.push_back((float) out.getRL(i, j, k));
        dumpF32("recon_32", buf.data(), buf.size());

        /* the same rotation set, for the python side */
        std::vector<float> rots;
        for (int s = 0; s < 60; s++) {
            double t0 = 0.37 * s + 0.11;
            double t1 = 0.53 * s + 0.71;
            double t2 = 0.29 * s + 1.31;
            dvec4 qv(cos(t0), sin(t0) * cos(t1),
                     sin(t0) * sin(t1) * cos(t2),
                     sin(t0) * sin(t1) * sin(t2));
            qv /= qv.norm();
            for (int c = 0; c < 4; c++) rots.push_back((float) qv(c));
        }
        dumpF32("recon_32_quats", rots.data(), rots.size());
    }

    /* ---- postprocess golden (Postprocess.cpp:50-183) --------------- */
    {
        const int NP = 48;
        Volume a(NP, NP, NP, RL_SPACE);
        Volume b(NP, NP, NP, RL_SPACE);
        Volume msk(NP, NP, NP, RL_SPACE);
        for (int k = -NP / 2; k < NP / 2; k++)
            for (int j = -NP / 2; j < NP / 2; j++)
                for (int i = -NP / 2; i < NP / 2; i++) {
                    double sig = phantomVal(i * 0.7, j * 0.7, k * 0.7);
                    /* deterministic pseudo-noise, reproducible in the
                     * python test */
                    double na = 0.05 * sin(12.9898 * i + 78.233 * j
                                           + 37.719 * k);
                    double nb = 0.05 * sin(26.651 * i + 14.313 * j
                                           + 95.173 * k);
                    a.setRL((RFLOAT) (sig + na), i, j, k);
                    b.setRL((RFLOAT) (sig + nb), i, j, k);
                    double r = sqrt((double) (i * i + j * j + k * k));
                    double w = r < 16 ? 1.0
                             : (r < 20 ? 0.5 + 0.5 * cos((r - 16) / 4 * M_PI)
                                       : 0.0);
                    msk.setRL((RFLOAT) w, i, j, k);
                }
        std::string pdir = g_dir + "/postprocess";
        (void) !system(("mkdir -p " + pdir).c_str());
        ImageFile imf;
        imf.readMetaData(a);
        imf.writeVolume((pdir + "/half_a.mrc").c_str(), a, 1.32);
        imf.readMetaData(b);
        imf.writeVolume((pdir + "/half_b.mrc").c_str(), b, 1.32);
        imf.readMetaData(msk);
        imf.writeVolume((pdir + "/mask.mrc").c_str(), msk, 1.32);

        /* Postprocess writes its artifacts into the CWD */
        char cwd0[4096];
        (void) !getcwd(cwd0, sizeof(cwd0));
        (void) !chdir(pdir.c_str());
        Postprocess pp("half_a.mrc", "half_b.mrc", "mask.mrc", 1.32);
        pp.run(nt);
        (void) !chdir(cwd0);
        printf("dump postprocess dir\n");
    }

    printf("goldens done\n");
    return 0;
}
