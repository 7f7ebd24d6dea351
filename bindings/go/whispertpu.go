// Package whispertpu is the Go binding for libwhisper_tpu.so, the
// whisper.h-compatible C ABI of the whisper_tpu TPU framework.
//
// This file is the low-level layer: thin cgo wrappers over the C
// functions declared in native/whisper_tpu.h.  The struct layouts come
// from the header itself (cgo compiles against it), so there is no
// hand-maintained field-offset table to rot.  The high-level
// Model/Context API lives in whisper.go.
//
// Role in the framework mirrors the reference's Go binding
// (reference: bindings/go/whisper.go — a cgo wrapper over whisper.h);
// the code here is written fresh against the whisper_tpu ABI.
//
// Build:
//
//	CGO_CFLAGS="-I${REPO}/native" \
//	CGO_LDFLAGS="-L${REPO}/native -lwhisper_tpu -Wl,-rpath,${REPO}/native" \
//	go build ./...
package whispertpu

/*
#cgo CFLAGS: -I${SRCDIR}/../../native
#cgo LDFLAGS: -L${SRCDIR}/../../native -lwhisper_tpu -Wl,-rpath,${SRCDIR}/../../native
#include <stdlib.h>
#include <string.h>
#include "whisper_tpu.h"

// Gateway for the new-segment callback: cgo cannot pass Go funcs as C
// function pointers directly, so the params carry this C shim and the
// Go side dispatches on the handle stored in user_data.
extern void goNewSegmentBridge(struct whisper_context * ctx,
                               struct whisper_state * state,
                               int n_new, void * user_data);

static void wtpu_set_segment_cb(struct whisper_full_params * p, void * handle) {
    p->new_segment_callback = goNewSegmentBridge;
    p->new_segment_callback_user_data = handle;
}
*/
import "C"

import (
	"errors"
	"fmt"
	"runtime/cgo"
	"unsafe"
)

// SamplingStrategy selects the decoder (reference: whisper.h
// whisper_sampling_strategy).
type SamplingStrategy int

const (
	SamplingGreedy     SamplingStrategy = C.WHISPER_SAMPLING_GREEDY
	SamplingBeamSearch SamplingStrategy = C.WHISPER_SAMPLING_BEAM_SEARCH
)

const (
	SampleRate = C.WHISPER_SAMPLE_RATE // expected PCM sample rate (16 kHz)
	ChunkSize  = C.WHISPER_CHUNK_SIZE  // seconds per processing window
)

var (
	ErrInit          = errors.New("whispertpu: model initialisation failed")
	ErrProcessFailed = errors.New("whispertpu: whisper_full failed")
)

// Context owns a loaded model plus its decode state (the C ABI's
// whisper_context).  Not safe for concurrent Process calls.
type Context struct {
	ctx    *C.struct_whisper_context
	params C.struct_whisper_full_params
}

// NewSegmentFn receives each newly finalised segment index range.
type NewSegmentFn func(ctx *Context, nNew int)

// InitFromFile loads a ggml model file (reference:
// whisper_init_from_file_with_params).
func InitFromFile(path string) (*Context, error) {
	cs := C.CString(path)
	defer C.free(unsafe.Pointer(cs))
	cp := C.whisper_context_default_params()
	ctx := C.whisper_init_from_file_with_params(cs, cp)
	if ctx == nil {
		return nil, fmt.Errorf("%w: %s", ErrInit, path)
	}
	c := &Context{ctx: ctx}
	c.params = C.whisper_full_default_params(C.enum_whisper_sampling_strategy(SamplingGreedy))
	return c, nil
}

// Close frees the model and all device buffers.
func (c *Context) Close() {
	if c.ctx != nil {
		C.whisper_free(c.ctx)
		c.ctx = nil
	}
}

// ResetParams re-primes the parameter block with the ABI defaults for
// the given strategy (reference: whisper_full_default_params).
func (c *Context) ResetParams(s SamplingStrategy) {
	c.params = C.whisper_full_default_params(C.enum_whisper_sampling_strategy(s))
}

// --- parameter setters (fields of whisper_full_params) ---

func (c *Context) SetTranslate(v bool)       { c.params.translate = C.bool(v) }
func (c *Context) SetNoContext(v bool)       { c.params.no_context = C.bool(v) }
func (c *Context) SetNoTimestamps(v bool)    { c.params.no_timestamps = C.bool(v) }
func (c *Context) SetSingleSegment(v bool)   { c.params.single_segment = C.bool(v) }
func (c *Context) SetTokenTimestamps(v bool) { c.params.token_timestamps = C.bool(v) }
func (c *Context) SetSplitOnWord(v bool)     { c.params.split_on_word = C.bool(v) }
func (c *Context) SetDetectLanguage(v bool)  { c.params.detect_language = C.bool(v) }
func (c *Context) SetSuppressBlank(v bool)   { c.params.suppress_blank = C.bool(v) }
func (c *Context) SetSuppressNST(v bool)     { c.params.suppress_nst = C.bool(v) }

func (c *Context) SetThreads(n int)       { c.params.n_threads = C.int(n) }
func (c *Context) SetMaxTextCtx(n int)    { c.params.n_max_text_ctx = C.int(n) }
func (c *Context) SetOffsetMS(n int)      { c.params.offset_ms = C.int(n) }
func (c *Context) SetDurationMS(n int)    { c.params.duration_ms = C.int(n) }
func (c *Context) SetMaxLen(n int)        { c.params.max_len = C.int(n) }
func (c *Context) SetMaxTokens(n int)     { c.params.max_tokens = C.int(n) }
func (c *Context) SetAudioCtx(n int)      { c.params.audio_ctx = C.int(n) }
func (c *Context) SetBestOf(n int)        { c.params.greedy.best_of = C.int(n) }
func (c *Context) SetBeamSize(n int) {
	c.params.strategy = C.enum_whisper_sampling_strategy(SamplingBeamSearch)
	c.params.beam_search.beam_size = C.int(n)
}

func (c *Context) SetTemperature(t float32)         { c.params.temperature = C.float(t) }
func (c *Context) SetTemperatureFallback(t float32) { c.params.temperature_inc = C.float(t) }
func (c *Context) SetEntropyThold(t float32)        { c.params.entropy_thold = C.float(t) }
func (c *Context) SetLogprobThold(t float32)        { c.params.logprob_thold = C.float(t) }
func (c *Context) SetNoSpeechThold(t float32)       { c.params.no_speech_thold = C.float(t) }
func (c *Context) SetTokenThreshold(t float32)      { c.params.thold_pt = C.float(t) }
func (c *Context) SetTokenSumThreshold(t float32)   { c.params.thold_ptsum = C.float(t) }
func (c *Context) SetMaxInitialTs(t float32)        { c.params.max_initial_ts = C.float(t) }

// SetLanguage sets the decode language ("auto" enables detection).
// The C string must outlive whisper_full, so it is interned.
func (c *Context) SetLanguage(lang string) error {
	if lang != "auto" && C.whisper_lang_id(intern(lang)) < 0 {
		return fmt.Errorf("whispertpu: unknown language %q", lang)
	}
	c.params.language = intern(lang)
	return nil
}

// SetInitialPrompt seeds the first window's text context.
func (c *Context) SetInitialPrompt(prompt string) {
	c.params.initial_prompt = intern(prompt)
}

// interned C strings live for the process lifetime — params keep raw
// pointers into them (the ABI does not copy).
var internTable = map[string]*C.char{}

func intern(s string) *C.char {
	if p, ok := internTable[s]; ok {
		return p
	}
	p := C.CString(s)
	internTable[s] = p
	return p
}

// --- processing ---

//export goNewSegmentBridge
func goNewSegmentBridge(ctx *C.struct_whisper_context, state *C.struct_whisper_state, nNew C.int, userData unsafe.Pointer) {
	// user_data carries the cgo.Handle's integer value (never a Go
	// pointer — cgo pointer rules forbid C-visible Go pointers).
	h := cgo.Handle(uintptr(userData))
	pair := h.Value().(*segmentDispatch)
	pair.fn(pair.ctx, int(nNew))
}

type segmentDispatch struct {
	ctx *Context
	fn  NewSegmentFn
}

// Process runs the full pipeline (mel → encode → decode → segments)
// over mono 16 kHz float32 PCM (reference: whisper_full).  cb may be
// nil; when set it fires after each finalised segment batch.
func (c *Context) Process(samples []float32, cb NewSegmentFn) error {
	if len(samples) == 0 {
		return errors.New("whispertpu: empty sample buffer")
	}
	p := c.params
	var handle cgo.Handle
	if cb != nil {
		handle = cgo.NewHandle(&segmentDispatch{ctx: c, fn: cb})
		defer handle.Delete()
		C.wtpu_set_segment_cb(&p, unsafe.Pointer(uintptr(handle)))
	}
	rc := C.whisper_full(c.ctx, p,
		(*C.float)(unsafe.Pointer(&samples[0])), C.int(len(samples)))
	if rc != 0 {
		return fmt.Errorf("%w: rc=%d", ErrProcessFailed, int(rc))
	}
	return nil
}

// ProcessParallel splits the audio into n chunks transcribed through the
// batched device path (reference: whisper_full_parallel).
func (c *Context) ProcessParallel(samples []float32, n int) error {
	if len(samples) == 0 {
		return errors.New("whispertpu: empty sample buffer")
	}
	rc := C.whisper_full_parallel(c.ctx, c.params,
		(*C.float)(unsafe.Pointer(&samples[0])), C.int(len(samples)), C.int(n))
	if rc != 0 {
		return fmt.Errorf("%w: rc=%d", ErrProcessFailed, int(rc))
	}
	return nil
}

// --- results ---

// NumSegments reports the segment count of the last Process call.
func (c *Context) NumSegments() int { return int(C.whisper_full_n_segments(c.ctx)) }

// SegmentText returns segment i's text.
func (c *Context) SegmentText(i int) string {
	return C.GoString(C.whisper_full_get_segment_text(c.ctx, C.int(i)))
}

// SegmentT0 / SegmentT1 return segment bounds in 10 ms ticks.
func (c *Context) SegmentT0(i int) int64 {
	return int64(C.whisper_full_get_segment_t0(c.ctx, C.int(i)))
}
func (c *Context) SegmentT1(i int) int64 {
	return int64(C.whisper_full_get_segment_t1(c.ctx, C.int(i)))
}

// SegmentSpeakerTurnNext reports the tinydiarize speaker-turn flag.
func (c *Context) SegmentSpeakerTurnNext(i int) bool {
	return bool(C.whisper_full_get_segment_speaker_turn_next(c.ctx, C.int(i)))
}

// NumTokens reports segment i's token count.
func (c *Context) NumTokens(i int) int {
	return int(C.whisper_full_n_tokens(c.ctx, C.int(i)))
}

// TokenData returns the full per-token record (id, probabilities,
// timestamps) for token j of segment i.
func (c *Context) TokenData(i, j int) TokenData {
	d := C.whisper_full_get_token_data(c.ctx, C.int(i), C.int(j))
	return TokenData{
		Id: int32(d.id), Tid: int32(d.tid),
		P: float32(d.p), Plog: float32(d.plog),
		Pt: float32(d.pt), Ptsum: float32(d.ptsum),
		T0: int64(d.t0), T1: int64(d.t1), TDtw: int64(d.t_dtw),
	}
}

// TokenText returns the text of token j of segment i.
func (c *Context) TokenText(i, j int) string {
	return C.GoString(C.whisper_full_get_token_text(c.ctx, C.int(i), C.int(j)))
}

// DetectedLangID returns the language id chosen by auto-detect.
func (c *Context) DetectedLangID() int { return int(C.whisper_full_lang_id(c.ctx)) }

// TokenData mirrors whisper_token_data.
type TokenData struct {
	Id, Tid          int32
	P, Plog          float32
	Pt, Ptsum        float32
	T0, T1, TDtw     int64
}

// --- model / vocab introspection ---

func (c *Context) IsMultilingual() bool { return C.whisper_is_multilingual(c.ctx) != 0 }
func (c *Context) NumVocab() int        { return int(C.whisper_n_vocab(c.ctx)) }
func (c *Context) NumTextCtx() int      { return int(C.whisper_n_text_ctx(c.ctx)) }
func (c *Context) NumAudioCtx() int     { return int(C.whisper_n_audio_ctx(c.ctx)) }

func (c *Context) TokenEOT() int32 { return int32(C.whisper_token_eot(c.ctx)) }
func (c *Context) TokenSOT() int32 { return int32(C.whisper_token_sot(c.ctx)) }
func (c *Context) TokenBEG() int32 { return int32(C.whisper_token_beg(c.ctx)) }
func (c *Context) TokenPREV() int32 {
	return int32(C.whisper_token_prev(c.ctx))
}
func (c *Context) TokenSOLM() int32 { return int32(C.whisper_token_solm(c.ctx)) }
func (c *Context) TokenNOT() int32  { return int32(C.whisper_token_not(c.ctx)) }
func (c *Context) TokenLang(langID int) int32 {
	return int32(C.whisper_token_lang(c.ctx, C.int(langID)))
}

// TokenToStr decodes one vocabulary id.
func (c *Context) TokenToStr(tok int32) string {
	return C.GoString(C.whisper_token_to_str(c.ctx, C.whisper_token(tok)))
}

// PrintTimings / ResetTimings mirror the reference timing helpers.
func (c *Context) PrintTimings() { C.whisper_print_timings(c.ctx) }
func (c *Context) ResetTimings() { C.whisper_reset_timings(c.ctx) }

// SystemInfo reports the engine build/device summary.
func SystemInfo() string { return C.GoString(C.whisper_print_system_info()) }

// Version reports the library version string.
func Version() string { return C.GoString(C.whisper_version()) }

// --- language helpers (context-free) ---

// LangID resolves a language code ("de") or full name ("german") to the
// internal id; -1 if unknown (reference: whisper_lang_id).
func LangID(lang string) int {
	cs := C.CString(lang)
	defer C.free(unsafe.Pointer(cs))
	return int(C.whisper_lang_id(cs))
}

// LangStr returns the short code for an id (reference: whisper_lang_str).
func LangStr(id int) string { return C.GoString(C.whisper_lang_str(C.int(id))) }

// LangStrFull returns the full English name for an id.
func LangStrFull(id int) string {
	return C.GoString(C.whisper_lang_str_full(C.int(id)))
}

// MaxLangID returns the highest valid language id.
func MaxLangID() int { return int(C.whisper_lang_max_id()) }

// Languages lists every supported language code.
func Languages() []string {
	out := make([]string, 0, MaxLangID()+1)
	for i := 0; i <= MaxLangID(); i++ {
		out = append(out, LangStr(i))
	}
	return out
}
