# Perl binding for whisper_tpu (role of the reference's go/java/ruby
# bindings — reference: bindings/go/whisper.go, thin whisper.h wrappers).
#
# Low-level XS surface (WhisperTPU::init_from_file, full, n_segments,
# segment_text/t0/t1, free_context) plus a tiny OO convenience layer.
package WhisperTPU;

use strict;
use warnings;
use XSLoader;

our $VERSION = '0.01';
XSLoader::load('WhisperTPU', $VERSION);

package WhisperTPU::Context;

sub new {
    my ($class, $model_path) = @_;
    my $ctx = WhisperTPU::init_from_file($model_path)
        or die "failed to load model '$model_path'";
    return bless { ctx => $ctx }, $class;
}

# $pcm is packed little-endian f32 mono 16 kHz (pack "f<*", @samples)
sub transcribe {
    my ($self, $pcm, %opt) = @_;
    my $rc = WhisperTPU::full(
        $self->{ctx}, $pcm,
        $opt{language} // "en",
        $opt{beam_size} // 1,
        exists $opt{temperature_inc} ? $opt{temperature_inc} : 0.2);
    die "whisper_full failed: $rc" if $rc != 0;
    my @segments;
    my $n = WhisperTPU::n_segments($self->{ctx});
    for my $i (0 .. $n - 1) {
        push @segments, {
            t0   => WhisperTPU::segment_t0($self->{ctx}, $i),
            t1   => WhisperTPU::segment_t1($self->{ctx}, $i),
            text => WhisperTPU::segment_text($self->{ctx}, $i),
        };
    }
    return \@segments;
}

sub DESTROY {
    my $self = shift;
    WhisperTPU::free_context($self->{ctx}) if $self->{ctx};
}

1;
