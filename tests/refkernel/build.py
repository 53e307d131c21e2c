"""Build the REFERENCE's compiled colDeltaCor kernel for golden/bench use.

The reference ships a Cython extension (velocyto/speedboosted.pyx, built
per /root/reference/setup.py:17-21 with ``-fopenmp -ffast-math``).  Its
generated C (speedboosted.c, Cython 0.27.3) cannot be compiled as a
Python extension against Python 3.12, but the six hot kernels are
``nogil`` functions whose generated bodies are plain C + OpenMP with no
Python API use.  This script extracts exactly those generated function
bodies from the reference's own speedboosted.c at build time (nothing
reference-derived is committed to the repo), stubs the Cython
bookkeeping macros, and compiles a shared library with the reference's
own flags.  The result is the reference's literal kernel code, callable
via ctypes, used ONLY as a test/bench oracle -- it is not part of the
velocyto_tpu framework.

Run:  python tests/refkernel/build.py   (writes tests/refkernel/libspeedboosted_ref.so)
"""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REF_C = "/root/reference/velocyto/speedboosted.c"
OUT_SO = os.path.join(HERE, "libspeedboosted_ref.so")

KERNELS = [
    "x_colDeltaCor",
    "x_colDeltaCorSqrt",
    "x_colDeltaCorLog10",
    "x_colDeltaCorpartial",
    "x_colDeltaCorSqrtpartial",
    "x_colDeltaCorLog10partial",
]

PRELUDE = r"""
/* Auto-extracted from the reference's generated speedboosted.c
   (Cython 0.27.3 output of velocyto/speedboosted.pyx) by
   tests/refkernel/build.py.  Cython bookkeeping macros are stubbed;
   the kernel bodies are byte-identical to the reference build. */
#include <stdlib.h>
#include <string.h>
#include <stddef.h>
#include <math.h>

typedef ptrdiff_t Py_ssize_t;
#define CYTHON_UNUSED
#define __Pyx_RefNannyDeclarations
#define __Pyx_RefNannySetupContext(name, acquire_gil)
#define __Pyx_RefNannyFinishContext()
#define likely(x) (x)
#define unlikely(x) (x)
/* WITH_THREAD deliberately left undefined: the GIL release/reacquire
   blocks compile away, everything else is untouched. */
"""

EPILOGUE = r"""
/* Clean exported names mirroring the pyx python wrappers
   (speedboosted.pyx:542-610). */
#define K(name) __pyx_f_8velocyto_12speedboosted_##name
void ref_colDeltaCor(double *e, double *d, double *rm,
                     int rows, int cols, int nt)
{ K(x_colDeltaCor)(e, d, rm, rows, cols, nt); }
void ref_colDeltaCorSqrt(double *e, double *d, double *rm,
                         int rows, int cols, int nt, double psc)
{ K(x_colDeltaCorSqrt)(e, d, rm, rows, cols, nt, psc); }
void ref_colDeltaCorLog10(double *e, double *d, double *rm,
                          int rows, int cols, int nt, double psc)
{ K(x_colDeltaCorLog10)(e, d, rm, rows, cols, nt, psc); }
void ref_colDeltaCorpartial(double *e, double *d, double *rm,
                            Py_ssize_t *ixs, int rows, int cols,
                            int nrndm, int nt)
{ K(x_colDeltaCorpartial)(e, d, rm, ixs, rows, cols, nrndm, nt); }
void ref_colDeltaCorSqrtpartial(double *e, double *d, double *rm,
                                Py_ssize_t *ixs, int rows, int cols,
                                int nrndm, int nt, double psc)
{ K(x_colDeltaCorSqrtpartial)(e, d, rm, ixs, rows, cols, nrndm, nt, psc); }
void ref_colDeltaCorLog10partial(double *e, double *d, double *rm,
                                 Py_ssize_t *ixs, int rows, int cols,
                                 int nrndm, int nt, double psc)
{ K(x_colDeltaCorLog10partial)(e, d, rm, ixs, rows, cols, nrndm, nt, psc); }
"""


def extract_kernels(ref_c_path: str) -> str:
    with open(ref_c_path, "r") as f:
        lines = f.readlines()
    protos = []
    bodies = []
    i = 0
    wanted = {f"__pyx_f_8velocyto_12speedboosted_{k}" for k in KERNELS}
    while i < len(lines):
        line = lines[i]
        if line.startswith("static void __pyx_f_8velocyto_12speedboosted_x_colDeltaCor"):
            name = line.split("(")[0].split()[-1]
            if name in wanted:
                if line.rstrip().endswith("/*proto*/"):
                    protos.append(line)
                elif line.rstrip().endswith("{"):
                    start = i
                    while lines[i].rstrip() != "}":
                        i += 1
                    bodies.append("".join(lines[start:i + 1]))
        i += 1
    assert len(bodies) == len(KERNELS), \
        f"expected {len(KERNELS)} kernel bodies, found {len(bodies)}"
    return "".join(protos) + "\n" + "\n\n".join(bodies)


def build(verbose: bool = True) -> str:
    src = PRELUDE + extract_kernels(REF_C) + EPILOGUE
    c_path = os.path.join(HERE, "speedboosted_ref_extracted.c")
    with open(c_path, "w") as f:
        f.write(src)
    # flags per /root/reference/setup.py:17-21 (+ default -O2 from distutils)
    cmd = ["gcc", "-O2", "-fopenmp", "-ffast-math", "-shared", "-fPIC",
           "-o", OUT_SO, c_path, "-lm"]
    subprocess.run(cmd, check=True)
    if verbose:
        print("built", OUT_SO)
    return OUT_SO


if __name__ == "__main__":
    sys.exit(0 if build() else 1)
