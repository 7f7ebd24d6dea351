/* Dump whisper_tokenize ids from the REFERENCE libwhisper.so.
 *
 * Used by tools/capture_tokenizer_goldens.py to pin byte-exact tokenizer
 * goldens (tests/golden/ref_tokenizer.json).  Reads a NUL-separated corpus
 * file, prints one JSON id array per input string.
 *
 * Build (see capture_tokenizer_goldens.py):
 *   g++ ref_tokenize.c -I$REF/include -I$REF/ggml/include \
 *       $REFBUILD/src/libwhisper.so -Wl,-rpath,... -o ref_tokenize
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "whisper.h"

static void quiet_log(enum ggml_log_level level, const char *text, void *ud) {
    (void) level; (void) text; (void) ud;
}

int main(int argc, char **argv) {
    if (argc != 3) {
        fprintf(stderr, "usage: %s MODEL CORPUS_NUL_SEPARATED\n", argv[0]);
        return 2;
    }
    whisper_log_set(quiet_log, NULL);
    struct whisper_context_params cparams = whisper_context_default_params();
    cparams.use_gpu = false;
    struct whisper_context *ctx =
        whisper_init_from_file_with_params_no_state(argv[1], cparams);
    if (!ctx) { fprintf(stderr, "model load failed\n"); return 1; }

    FILE *f = fopen(argv[2], "rb");
    if (!f) { fprintf(stderr, "corpus open failed\n"); return 1; }
    fseek(f, 0, SEEK_END);
    long sz = ftell(f);
    fseek(f, 0, SEEK_SET);
    char *buf = (char *) malloc(sz + 1);
    if (fread(buf, 1, sz, f) != (size_t) sz) { return 1; }
    buf[sz] = 0;
    fclose(f);

    whisper_token tokens[8192];
    long off = 0;
    while (off < sz) {
        const char *s = buf + off;
        int n = whisper_tokenize(ctx, s, tokens, 8192);
        if (n < 0) { fprintf(stderr, "tokenize overflow\n"); return 1; }
        printf("[");
        for (int i = 0; i < n; i++) printf(i ? ",%d" : "%d", tokens[i]);
        printf("]\n");
        off += (long) strlen(s) + 1;
    }
    whisper_free(ctx);
    free(buf);
    return 0;
}
