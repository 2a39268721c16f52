#!/usr/bin/env bash
# Build the reference C tools into $1 (golden-test binaries only).
# MaxCorrelation / RepeatResolver link against tests/golden/gsl_shim.c
# instead of real GSL (not installed in this image).
set -euo pipefail
OUT="$1"
REF=/root/reference
HERE="$(cd "$(dirname "$0")" && pwd)"
mkdir -p "$OUT"

gcc -O2 -o "$OUT/ReadCutter"      "$REF/ReadCutter.c"      -lm
gcc -O2 -o "$OUT/InitialAligner"  "$REF/InitialAligner.c"  -lm -lpthread
gcc -O2 -mcmodel=medium -o "$OUT/PW_ReAligner" "$REF/PW_ReAligner.c" -lm

mkdir -p "$OUT/include/gsl"
cat > "$OUT/include/gsl/gsl_cdf.h" <<'EOF'
#ifndef GSL_SHIM_CDF_H
#define GSL_SHIM_CDF_H
double gsl_cdf_hypergeometric_Q(unsigned int k, unsigned int n1,
                                unsigned int n2, unsigned int t);
double gsl_cdf_hypergeometric_P(unsigned int k, unsigned int n1,
                                unsigned int n2, unsigned int t);
double gsl_cdf_binomial_Q(unsigned int k, double p, unsigned int n);
#endif
EOF

gcc -O2 -I"$OUT/include" -o "$OUT/MaxCorrelation" \
    "$REF/MaxCorrelation.c" "$HERE/gsl_shim.c" -lm -lpthread
gcc -O2 -mcmodel=medium -I"$OUT/include" -o "$OUT/RepeatResolver" \
    "$REF/RepeatResolver.c" "$HERE/gsl_shim.c" -lm -lpthread
echo "built reference tools in $OUT"
