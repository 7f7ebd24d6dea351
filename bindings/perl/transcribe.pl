#!/usr/bin/perl
# Transcribe a 16 kHz mono WAV through the whisper_tpu engine from Perl
# (role of the reference's bindings/go/examples/go-whisper).
#
#   LD_LIBRARY_PATH=../../native WHISPER_TPU_ROOT=../.. \
#     perl -I. transcribe.pl <model.bin> <audio.wav>
use strict;
use warnings;
use FindBin;
use lib $FindBin::Bin;
use WhisperTPU;

my ($model, $wav) = @ARGV;
die "usage: transcribe.pl <model.bin> <audio.wav>\n"
    unless defined $model && defined $wav;

# minimal 16-bit PCM mono WAV reader (enough for the samples/ files)
open my $fh, '<:raw', $wav or die "open $wav: $!";
read $fh, my $hdr, 12;
die "not a RIFF/WAVE file\n" unless substr($hdr, 0, 4) eq 'RIFF'
    && substr($hdr, 8, 4) eq 'WAVE';
my $pcm16 = '';
while (read $fh, my $chdr, 8) {
    my ($id, $size) = unpack 'A4 V', $chdr;
    read $fh, my $data, $size;
    $pcm16 = $data if $id eq 'data';
}
close $fh;
die "no data chunk\n" unless length $pcm16;

my @s16 = unpack 's<*', $pcm16;
my $pcm = pack 'f<*', map { $_ / 32768.0 } @s16;

my $ctx = WhisperTPU::Context->new($model);
my $segments = $ctx->transcribe($pcm, language => "en",
                                temperature_inc => 0.0);
for my $seg (@$segments) {
    printf "[%.2fs -> %.2fs]%s\n", $seg->{t0} / 100, $seg->{t1} / 100,
        $seg->{text};
}
