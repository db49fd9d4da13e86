// Native IO runtime for mcmc_spec_tpu.
//
// The dominant host-side cost in the reference pipeline is the grid preload:
// a python float() loop over hundreds of MB of two-column ASCII model spectra
// (reference spec_interpolator, mft6.py:347-364).  This loader memory-maps the
// file, scans it with strtod, and applies the wavelength window during the
// scan, typically ~50-100x faster than the python loop.  Exposed via a plain C
// ABI consumed with ctypes (no pybind11 in this toolchain).
//
// Build: `make -C mcmc_spec_tpu/runtime/native` (produces libfastascii.so).

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>
#include <thread>
#include <atomic>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

// Reads the first two whitespace-separated float columns of `path`, keeping
// rows with lo <= col0 <= hi.  Returns a malloc'd buffer of 2*n doubles
// (col0[0..n), col1[0..n)) and sets *n_out; returns nullptr on error.
double* msq_read_two_columns(const char* path, double lo, double hi, long* n_out) {
    *n_out = 0;
    int fd = open(path, O_RDONLY);
    if (fd < 0) return nullptr;
    struct stat st;
    if (fstat(fd, &st) != 0 || st.st_size == 0) {
        close(fd);
        return nullptr;
    }
    size_t size = static_cast<size_t>(st.st_size);
    char* data = static_cast<char*>(mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0));
    close(fd);
    if (data == MAP_FAILED) return nullptr;

    std::vector<double> wl, fx;
    wl.reserve(1 << 16);
    fx.reserve(1 << 16);

    const char* p = data;
    const char* end = data + size;
    while (p < end) {
        // parse col0
        char* next = nullptr;
        double a = strtod(p, &next);
        if (next == p) {  // no parse: skip to next line
            while (p < end && *p != '\n') ++p;
            if (p < end) ++p;
            continue;
        }
        p = next;
        double b = strtod(p, &next);
        bool ok = (next != p);
        p = next;
        // skip remainder of line
        while (p < end && *p != '\n') ++p;
        if (p < end) ++p;
        if (ok && a >= lo && a <= hi) {
            wl.push_back(a);
            fx.push_back(b);
        }
    }
    munmap(data, size);

    long n = static_cast<long>(wl.size());
    double* out = static_cast<double*>(malloc(sizeof(double) * 2 * (n > 0 ? n : 1)));
    if (!out) return nullptr;
    memcpy(out, wl.data(), sizeof(double) * n);
    memcpy(out + n, fx.data(), sizeof(double) * n);
    *n_out = n;
    return out;
}

// Parallel batch read: nfiles paths, shared window, per-file outputs written
// into caller-provided slots via msq_read_two_columns.  Results array must
// hold nfiles pointers; counts must hold nfiles longs.
void msq_read_many(const char** paths, long nfiles, double lo, double hi,
                   double** results, long* counts, int nthreads) {
    if (nthreads <= 0) nthreads = static_cast<int>(std::thread::hardware_concurrency());
    if (nthreads <= 0) nthreads = 4;
    std::atomic<long> cursor{0};
    auto worker = [&]() {
        for (;;) {
            long i = cursor.fetch_add(1);
            if (i >= nfiles) break;
            results[i] = msq_read_two_columns(paths[i], lo, hi, &counts[i]);
        }
    };
    std::vector<std::thread> threads;
    int nt = static_cast<int>(nfiles < nthreads ? nfiles : nthreads);
    for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
    for (auto& th : threads) th.join();
}

// Reads every whitespace-separated float in `path` (single-column layout:
// the PHOENIX HiRes flux/wave files hold one value per line,
// mft6.py:271-279).  Returns a malloc'd buffer of n doubles.
double* msq_read_single_column(const char* path, long* n_out) {
    *n_out = 0;
    int fd = open(path, O_RDONLY);
    if (fd < 0) return nullptr;
    struct stat st;
    if (fstat(fd, &st) != 0 || st.st_size == 0) {
        close(fd);
        return nullptr;
    }
    size_t size = static_cast<size_t>(st.st_size);
    char* data = static_cast<char*>(mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0));
    close(fd);
    if (data == MAP_FAILED) return nullptr;

    std::vector<double> vals;
    vals.reserve(1 << 18);
    const char* p = data;
    const char* end = data + size;
    while (p < end) {
        if (*p == '#') {  // np.loadtxt semantics: '#' comments out the rest
            while (p < end && *p != '\n') ++p;  // of the line (headers with
            continue;                           // digits must not be parsed)
        }
        char* next = nullptr;
        double a = strtod(p, &next);
        if (next == p) {
            ++p;
            continue;
        }
        vals.push_back(a);
        p = next;
    }
    munmap(data, size);

    long n = static_cast<long>(vals.size());
    double* out = static_cast<double*>(malloc(sizeof(double) * (n > 0 ? n : 1)));
    if (!out) return nullptr;
    memcpy(out, vals.data(), sizeof(double) * n);
    *n_out = n;
    return out;
}

// Parallel batch single-column read (HiRes grid preload).
void msq_read_many_single(const char** paths, long nfiles, double** results,
                          long* counts, int nthreads) {
    if (nthreads <= 0) nthreads = static_cast<int>(std::thread::hardware_concurrency());
    if (nthreads <= 0) nthreads = 4;
    std::atomic<long> cursor{0};
    auto worker = [&]() {
        for (;;) {
            long i = cursor.fetch_add(1);
            if (i >= nfiles) break;
            results[i] = msq_read_single_column(paths[i], &counts[i]);
        }
    };
    std::vector<std::thread> threads;
    int nt = static_cast<int>(nfiles < nthreads ? nfiles : nthreads);
    for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
    for (auto& th : threads) th.join();
}

void msq_free(double* p) { free(p); }

}  // extern "C"
