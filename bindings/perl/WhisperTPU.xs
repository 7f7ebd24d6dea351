/* Perl XS binding for the whisper_tpu C ABI (libwhisper_tpu.so).
 *
 * The reference ships go/java/ruby bindings as thin whisper.h wrappers
 * (reference: bindings/go/whisper.go, bindings/ruby, bindings/java);
 * those toolchains are absent from this image, so Perl — the
 * foreign-language toolchain that IS present — plays their role: a
 * non-C, non-Python client of the shared library, proving the ABI
 * carries a real binding (beyond the drop-in reference-CLI proof).
 *
 * Build: ./bindings/perl/build.sh   (xsubpp + gcc, links libwhisper_tpu)
 * Use:   use WhisperTPU;  see transcribe.pl
 */

#define PERL_NO_GET_CONTEXT
#include "EXTERN.h"
#include "perl.h"
#include "XSUB.h"

#include "whisper_tpu.h"

typedef struct whisper_context wtpu_ctx;

MODULE = WhisperTPU    PACKAGE = WhisperTPU    PREFIX = wtpu_

PROTOTYPES: DISABLE

IV
wtpu_init_from_file(path)
    const char * path
  CODE:
    RETVAL = PTR2IV(whisper_init_from_file(path));
  OUTPUT:
    RETVAL

void
wtpu_free_context(ctx)
    IV ctx
  CODE:
    whisper_free(INT2PTR(wtpu_ctx *, ctx));

int
wtpu_full(ctx, pcm_f32le, language, beam_size, temperature_inc)
    IV ctx
    SV * pcm_f32le
    const char * language
    int beam_size
    double temperature_inc
  PREINIT:
    STRLEN len;
    const float * samples;
    struct whisper_full_params params;
  CODE:
    samples = (const float *) SvPVbyte(pcm_f32le, len);
    params = whisper_full_default_params(
        beam_size > 1 ? WHISPER_SAMPLING_BEAM_SEARCH
                      : WHISPER_SAMPLING_GREEDY);
    params.language = language;
    params.print_progress = false;
    params.print_realtime = false;
    params.temperature_inc = (float) temperature_inc;
    if (beam_size > 1)
        params.beam_search.beam_size = beam_size;
    RETVAL = whisper_full(INT2PTR(wtpu_ctx *, ctx), params,
                          samples, (int)(len / sizeof(float)));
  OUTPUT:
    RETVAL

int
wtpu_n_segments(ctx)
    IV ctx
  CODE:
    RETVAL = whisper_full_n_segments(INT2PTR(wtpu_ctx *, ctx));
  OUTPUT:
    RETVAL

const char *
wtpu_segment_text(ctx, i)
    IV ctx
    int i
  CODE:
    RETVAL = whisper_full_get_segment_text(INT2PTR(wtpu_ctx *, ctx), i);
  OUTPUT:
    RETVAL

double
wtpu_segment_t0(ctx, i)
    IV ctx
    int i
  CODE:
    RETVAL = (double) whisper_full_get_segment_t0(INT2PTR(wtpu_ctx *, ctx), i);
  OUTPUT:
    RETVAL

double
wtpu_segment_t1(ctx, i)
    IV ctx
    int i
  CODE:
    RETVAL = (double) whisper_full_get_segment_t1(INT2PTR(wtpu_ctx *, ctx), i);
  OUTPUT:
    RETVAL

const char *
wtpu_lang_str(id)
    int id
  CODE:
    RETVAL = whisper_lang_str(id);
  OUTPUT:
    RETVAL

const char *
wtpu_print_system_info()
  CODE:
    RETVAL = whisper_print_system_info();
  OUTPUT:
    RETVAL
