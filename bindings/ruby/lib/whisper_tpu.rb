# Ruby binding for libwhisper_tpu.so — the whisper.h-compatible C ABI
# of the whisper_tpu TPU framework.
#
# Pure stdlib: Fiddle (dlopen + libffi), no compiled extension — any
# stock Ruby can load it.  This plays the role of the reference's ruby
# gem (reference: bindings/ruby/ext/ruby_whisper.c, a compiled C
# extension); the API here is written fresh against the whisper_tpu ABI.
#
# Struct-by-value C calls are impossible through libffi without a
# descriptor, so this binding uses the ABI's by-pointer forwards
# (whisper_full_ref & friends, declared in native/whisper_tpu.h) and
# pokes fields of the default-params block through a Fiddle struct
# whose layout is pinned against the C compiler by
# tests/test_bindings_abi.py.
#
#   require "whisper_tpu"
#   ctx = WhisperTPU::Context.new("model.bin")
#   ctx.language = "en"
#   ctx.transcribe(samples) # Array<Float> or packed "f*" String, 16 kHz mono
#   ctx.each_segment { |s| puts "[#{s.t0} -> #{s.t1}] #{s.text}" }

require "fiddle"
require "fiddle/import"

module WhisperTPU
  extend Fiddle::Importer

  lib = ENV["WHISPER_TPU_LIB"] ||
        File.expand_path("../../../native/libwhisper_tpu.so", __dir__)
  dlload lib

  SAMPLE_RATE = 16_000

  # whisper_sampling_strategy
  SAMPLING_GREEDY      = 0
  SAMPLING_BEAM_SEARCH = 1

  # Flattened member list of struct whisper_full_params
  # (native/whisper_tpu.h).  `char` stands in for C bool (same size and
  # alignment); the nested greedy/beam_search structs are flattened,
  # which preserves every offset because their alignment equals int's.
  # tests/test_bindings_abi.py compiles this exact list as a C struct
  # and asserts offset-for-offset equality with the real one.
  FULL_PARAMS_DECL = [
    "int strategy",
    "int n_threads",
    "int n_max_text_ctx",
    "int offset_ms",
    "int duration_ms",
    "char translate",
    "char no_context",
    "char no_timestamps",
    "char single_segment",
    "char print_special",
    "char print_progress",
    "char print_realtime",
    "char print_timestamps",
    "char token_timestamps",
    "float thold_pt",
    "float thold_ptsum",
    "int max_len",
    "char split_on_word",
    "int max_tokens",
    "char debug_mode",
    "int audio_ctx",
    "char tdrz_enable",
    "void* suppress_regex",
    "void* initial_prompt",
    "void* prompt_tokens",
    "int prompt_n_tokens",
    "void* language",
    "char detect_language",
    "char suppress_blank",
    "char suppress_nst",
    "float temperature",
    "float max_initial_ts",
    "float length_penalty",
    "float temperature_inc",
    "float entropy_thold",
    "float logprob_thold",
    "float no_speech_thold",
    "int greedy_best_of",
    "int beam_search_beam_size",
    "float beam_search_patience",
    "void* new_segment_callback",
    "void* new_segment_callback_user_data",
    "void* progress_callback",
    "void* progress_callback_user_data",
    "void* encoder_begin_callback",
    "void* encoder_begin_callback_user_data",
    "void* abort_callback",
    "void* abort_callback_user_data",
    "void* logits_filter_callback",
    "void* logits_filter_callback_user_data",
    "void* grammar_rules",
    "size_t n_grammar_rules",
    "size_t i_start_rule",
    "float grammar_penalty",
  ].freeze

  FullParams = struct(FULL_PARAMS_DECL)

  # ---- C functions ----
  extern "void* whisper_init_from_file(const char*)"
  extern "void whisper_free(void*)"
  extern "void* whisper_full_default_params_by_ref(int)"
  extern "void whisper_free_params(void*)"
  extern "int whisper_full_ref(void*, void*, float*, int)"
  extern "int whisper_full_parallel_ref(void*, void*, float*, int, int)"

  extern "int whisper_full_n_segments(void*)"
  extern "long long whisper_full_get_segment_t0(void*, int)"
  extern "long long whisper_full_get_segment_t1(void*, int)"
  extern "char whisper_full_get_segment_speaker_turn_next(void*, int)"
  extern "const char* whisper_full_get_segment_text(void*, int)"
  extern "int whisper_full_n_tokens(void*, int)"
  extern "const char* whisper_full_get_token_text(void*, int, int)"
  extern "int whisper_full_get_token_id(void*, int, int)"
  extern "float whisper_full_get_token_p(void*, int, int)"
  extern "int whisper_full_lang_id(void*)"

  extern "int whisper_is_multilingual(void*)"
  extern "int whisper_n_vocab(void*)"
  extern "int whisper_n_text_ctx(void*)"
  extern "int whisper_n_audio_ctx(void*)"
  extern "const char* whisper_token_to_str(void*, int)"
  extern "int whisper_token_eot(void*)"
  extern "int whisper_token_sot(void*)"
  extern "int whisper_token_beg(void*)"

  extern "int whisper_lang_id(const char*)"
  extern "int whisper_lang_max_id()"
  extern "const char* whisper_lang_str(int)"
  extern "const char* whisper_lang_str_full(int)"
  extern "const char* whisper_print_system_info()"
  extern "const char* whisper_version()"
  extern "void whisper_print_timings(void*)"
  extern "void whisper_reset_timings(void*)"

  class Error < StandardError; end

  Segment = Struct.new(:index, :t0, :t1, :text, :speaker_turn_next) do
    # t0/t1 are seconds (Float); the raw ABI ticks are 10 ms units.
    def to_s = format("[%6.2f -> %6.2f] %s", t0, t1, text)
  end

  module_function

  def lang_id(code)       = whisper_lang_id(code)
  def lang_str(id)        = whisper_lang_str(id).to_s
  def lang_str_full(id)   = whisper_lang_str_full(id).to_s
  def languages           = (0..whisper_lang_max_id).map { |i| lang_str(i) }
  def system_info         = whisper_print_system_info.to_s
  def version             = whisper_version.to_s

  # Context owns a loaded model plus its decode state.
  class Context
    def initialize(model_path, strategy: SAMPLING_GREEDY)
      @ctx = WhisperTPU.whisper_init_from_file(model_path)
      raise Error, "failed to load model: #{model_path}" if @ctx.null?
      raw = WhisperTPU.whisper_full_default_params_by_ref(strategy)
      raise Error, "default params failed" if raw.null?
      # Copy the defaults into Ruby-owned memory, then free the C block.
      @params = FullParams.malloc
      Fiddle::Pointer.new(@params.to_ptr)[0, FullParams.size] =
        raw[0, FullParams.size]
      WhisperTPU.whisper_free_params(raw)
      @keep = {} # interned C strings the params point into
      ObjectSpace.define_finalizer(self, self.class.finalizer(@ctx))
    end

    def self.finalizer(ctx)
      proc { WhisperTPU.whisper_free(ctx) unless ctx.null? }
    end

    def close
      return if @ctx.null?
      WhisperTPU.whisper_free(@ctx)
      @ctx = Fiddle::NULL
    end

    # ---- parameter accessors ----
    BOOL_FIELDS = %i[translate no_context no_timestamps single_segment
                     print_special print_progress print_realtime
                     print_timestamps token_timestamps split_on_word
                     debug_mode tdrz_enable detect_language
                     suppress_blank suppress_nst].freeze
    BOOL_FIELDS.each do |f|
      define_method("#{f}=") { |v| @params.send("#{f}=", v ? 1 : 0) }
      define_method("#{f}?") { @params.send(f) != 0 }
    end

    INT_FIELDS = %i[strategy n_threads n_max_text_ctx offset_ms
                    duration_ms max_len max_tokens audio_ctx
                    greedy_best_of beam_search_beam_size].freeze
    FLOAT_FIELDS = %i[thold_pt thold_ptsum temperature max_initial_ts
                      length_penalty temperature_inc entropy_thold
                      logprob_thold no_speech_thold
                      beam_search_patience].freeze
    (INT_FIELDS + FLOAT_FIELDS).each do |f|
      define_method("#{f}=") { |v| @params.send("#{f}=", v) }
      define_method(f) { @params.send(f) }
    end

    def language=(code)
      if code != "auto" && WhisperTPU.lang_id(code) < 0
        raise Error, "unknown language: #{code}"
      end
      @params.language = intern(code)
    end

    def initial_prompt=(text)
      @params.initial_prompt = intern(text)
    end

    def beam_size=(n)
      @params.strategy = SAMPLING_BEAM_SEARCH
      @params.beam_search_beam_size = n
    end

    # ---- processing ----

    # samples: Array<Float> in [-1, 1] or a packed "f*" String,
    # 16 kHz mono.  Returns the number of segments.
    def transcribe(samples, n_processors: 1)
      pcm = samples.is_a?(String) ? samples : samples.pack("f*")
      n = pcm.bytesize / 4
      raise Error, "empty sample buffer" if n.zero?
      buf = Fiddle::Pointer.malloc(pcm.bytesize, Fiddle::RUBY_FREE)
      buf[0, pcm.bytesize] = pcm
      rc =
        if n_processors > 1
          WhisperTPU.whisper_full_parallel_ref(@ctx, @params.to_ptr, buf, n,
                                               n_processors)
        else
          WhisperTPU.whisper_full_ref(@ctx, @params.to_ptr, buf, n)
        end
      raise Error, "whisper_full failed: rc=#{rc}" unless rc.zero?
      n_segments
    end

    # ---- results ----
    def n_segments = WhisperTPU.whisper_full_n_segments(@ctx)

    def segment(i)
      Segment.new(
        i,
        WhisperTPU.whisper_full_get_segment_t0(@ctx, i) / 100.0,
        WhisperTPU.whisper_full_get_segment_t1(@ctx, i) / 100.0,
        WhisperTPU.whisper_full_get_segment_text(@ctx, i).to_s,
        WhisperTPU.whisper_full_get_segment_speaker_turn_next(@ctx, i) != 0,
      )
    end

    def each_segment
      return enum_for(:each_segment) unless block_given?
      n_segments.times { |i| yield segment(i) }
    end

    def full_text = each_segment.map(&:text).join

    def n_tokens(i)        = WhisperTPU.whisper_full_n_tokens(@ctx, i)
    def token_text(i, j)   = WhisperTPU.whisper_full_get_token_text(@ctx, i, j).to_s
    def token_id(i, j)     = WhisperTPU.whisper_full_get_token_id(@ctx, i, j)
    def token_p(i, j)      = WhisperTPU.whisper_full_get_token_p(@ctx, i, j)
    def detected_lang_id   = WhisperTPU.whisper_full_lang_id(@ctx)

    # ---- model introspection ----
    def multilingual?  = WhisperTPU.whisper_is_multilingual(@ctx) != 0
    def n_vocab        = WhisperTPU.whisper_n_vocab(@ctx)
    def n_text_ctx     = WhisperTPU.whisper_n_text_ctx(@ctx)
    def n_audio_ctx    = WhisperTPU.whisper_n_audio_ctx(@ctx)
    def token_to_str(t) = WhisperTPU.whisper_token_to_str(@ctx, t).to_s
    def token_eot      = WhisperTPU.whisper_token_eot(@ctx)
    def token_sot      = WhisperTPU.whisper_token_sot(@ctx)
    def token_beg      = WhisperTPU.whisper_token_beg(@ctx)
    def print_timings  = WhisperTPU.whisper_print_timings(@ctx)
    def reset_timings  = WhisperTPU.whisper_reset_timings(@ctx)

    private

    # Params hold raw char* pointers; the backing memory must outlive
    # every whisper_full call, so interned strings are kept on @keep.
    def intern(str)
      @keep[str] ||= begin
        p = Fiddle::Pointer.malloc(str.bytesize + 1, Fiddle::RUBY_FREE)
        p[0, str.bytesize] = str
        p[str.bytesize, 1] = "\0"
        p
      end
    end
  end
end
