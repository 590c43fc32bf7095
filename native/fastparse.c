/* Fast bulk numeric file parser for the atomic/model data pipeline.
 *
 * The reference implementation parses its (potentially >100 MB)
 * atomic datasets with C++ iostream/fscanf loops (input.cc). This is
 * the TPU build's native equivalent: one pass of strtod over a
 * memory-buffered file, skipping '#' comments, filling a caller-
 * provided double array. Python-side bindings live in
 * artis_tpu/native.py (ctypes; no external dependencies).
 *
 * Build: cc -O3 -shared -fPIC fastparse.c -o libfastparse.so
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

/* Parse up to maxn whitespace-separated numbers from the file.
 * Lines starting with '#' (after optional whitespace) are skipped.
 * Returns the count parsed, or -1 on I/O error, or -2 if the buffer
 * was too small. */
long fastparse_doubles(const char *path, double *out, long maxn) {
    FILE *f = fopen(path, "rb");
    if (!f) return -1;
    if (fseek(f, 0, SEEK_END) != 0) { fclose(f); return -1; }
    long size = ftell(f);
    if (size < 0) { fclose(f); return -1; }
    rewind(f);

    char *buf = (char *)malloc((size_t)size + 1);
    if (!buf) { fclose(f); return -1; }
    size_t got = fread(buf, 1, (size_t)size, f);
    fclose(f);
    buf[got] = '\0';

    long n = 0;
    const char *p = buf;
    const char *end = buf + got;
    while (p < end) {
        /* skip whitespace */
        while (p < end && (*p == ' ' || *p == '\t' || *p == '\r'
                           || *p == '\n')) p++;
        if (p >= end) break;
        if (*p == '#') { /* comment to end of line */
            while (p < end && *p != '\n') p++;
            continue;
        }
        char *next = NULL;
        double v = strtod(p, &next);
        if (next == p) { /* unparseable token: skip it */
            while (p < end && *p != ' ' && *p != '\t' && *p != '\r'
                   && *p != '\n') p++;
            continue;
        }
        if (n >= maxn) { free(buf); return -2; }
        out[n++] = v;
        p = next;
    }
    free(buf);
    return n;
}

/* Count the numbers without storing them (for exact allocation). */
long fastparse_count(const char *path) {
    FILE *f = fopen(path, "rb");
    if (!f) return -1;
    if (fseek(f, 0, SEEK_END) != 0) { fclose(f); return -1; }
    long size = ftell(f);
    if (size < 0) { fclose(f); return -1; }
    rewind(f);
    char *buf = (char *)malloc((size_t)size + 1);
    if (!buf) { fclose(f); return -1; }
    size_t got = fread(buf, 1, (size_t)size, f);
    fclose(f);
    buf[got] = '\0';

    long n = 0;
    const char *p = buf;
    const char *end = buf + got;
    while (p < end) {
        while (p < end && (*p == ' ' || *p == '\t' || *p == '\r'
                           || *p == '\n')) p++;
        if (p >= end) break;
        if (*p == '#') { while (p < end && *p != '\n') p++; continue; }
        char *next = NULL;
        strtod(p, &next);
        if (next == p) {
            while (p < end && *p != ' ' && *p != '\t' && *p != '\r'
                   && *p != '\n') p++;
            continue;
        }
        n++;
        p = next;
    }
    free(buf);
    return n;
}
