#!/usr/bin/env perl
# Independent .pcb reader + evaluator in Perl (core modules only).
#
# Fourth consumer of the portable binary format, written against
# docs/user-guide/binary-format.md: parses Approximation (class_tag 1)
# and Spline (class_tag 2) records, regenerates the Chebyshev grid, and
# evaluates via the normalized barycentric collapse.
#
# Usage:
#   perl pcbreader.pl model.pcb                 # info
#   perl pcbreader.pl model.pcb x1 x2 ... xd    # evaluate, prints %.17g
#
# Exit codes: 0 ok, 1 parse/eval error, 2 usage.

use strict;
use warnings;
use POSIX qw(floor);

use constant {
    MAGIC     => "PCB\x00",
    MAJOR     => 1,
    TAG_APPROX => 1,
    TAG_SPLINE => 2,
    NODE_TOL  => 1e-14,
    MAX_TOTAL => 134_217_728,   # 1<<27; shared by every .pcb consumer
};

my $PI = 4 * atan2(1, 1);

# ---- cursor over the raw bytes -------------------------------------------

package Scanner;

sub new { my ($c, $data) = @_; bless { data => $data, pos => 0 }, $c }

sub pull {
    my ($s, $n, $what) = @_;
    die "Truncated: $what needs $n bytes at offset $s->{pos}\n"
        if $s->{pos} + $n > length $s->{data};
    my $chunk = substr $s->{data}, $s->{pos}, $n;
    $s->{pos} += $n;
    return $chunk;
}

sub u32  { my ($s, $w) = @_; unpack "V",  $s->pull(4, $w) }
sub u32s { my ($s, $n, $w) = @_; [unpack "V$n", $s->pull(4 * $n, $w)] }
sub f64s { my ($s, $n, $w) = @_; [unpack "d<$n", $s->pull(8 * $n, $w)] }

package main;

# ---- grid reconstruction ---------------------------------------------------

sub chebyshev_nodes {
    my ($lo, $hi, $n) = @_;
    my ($mid, $half) = (0.5 * ($lo + $hi), 0.5 * ($hi - $lo));
    my @pts = map { $mid - $half * cos((2 * $_ + 1) * $PI / (2 * $n)) }
              0 .. $n - 1;
    return [sort { $a <=> $b } @pts];
}

sub barycentric_weights {
    my ($nodes) = @_;
    my @w;
    for my $i (0 .. $#$nodes) {
        my $prod = 1.0;
        for my $j (0 .. $#$nodes) {
            $prod *= $nodes->[$i] - $nodes->[$j] unless $j == $i;
        }
        # Degenerate grid (coincident nodes) must be a typed error,
        # not a division-by-zero crash or inf weights.
        die "InvalidField: degenerate grid (non-finite weights)\n"
            if $prod == 0.0 || $prod != $prod;
        push @w, 1.0 / $prod;
    }
    return \@w;
}

# Collapse the highest dim first: flat C-order values shrink by n each
# pass, contracted with the normalized barycentric row (or the nodal
# slice on a coincidence hit).
sub collapse {
    my ($vals, $shape, $nodes_pd, $weights_pd, $point) = @_;
    my @v = @$vals;
    for (my $d = $#$shape; $d >= 0; $d--) {
        my $n = $shape->[$d];
        my ($nodes, $weights, $x) = ($nodes_pd->[$d], $weights_pd->[$d],
                                     $point->[$d]);
        my $hit = -1;
        for my $i (0 .. $n - 1) {
            if (abs($x - $nodes->[$i]) < NODE_TOL) { $hit = $i; last }
        }
        my @out;
        if ($hit >= 0) {
            for (my $base = 0; $base < @v; $base += $n) {
                push @out, $v[$base + $hit];
            }
        } else {
            my (@terms, $denom);
            $denom = 0.0;
            for my $i (0 .. $n - 1) {
                my $t = $weights->[$i] / ($x - $nodes->[$i]);
                push @terms, $t;
                $denom += $t;
            }
            for (my $base = 0; $base < @v; $base += $n) {
                my $acc = 0.0;
                $acc += $v[$base + $_] * $terms[$_] for 0 .. $n - 1;
                push @out, $acc / $denom;
            }
        }
        @v = @out;
    }
    return $v[0];
}

# ---- parsing ----------------------------------------------------------------

sub parse_header {
    my ($sc) = @_;
    my $raw = $sc->pull(12, "header");
    die "InvalidMagic: not a .pcb file\n"
        unless substr($raw, 0, 4) eq MAGIC;
    my ($major, $minor, $tag) = unpack "CCv", substr($raw, 4, 4);
    die "UnsupportedVersion: major $major\n" unless $major == MAJOR;
    die "NonzeroReserved: reserved bytes set\n"
        unless substr($raw, 8, 4) eq "\x00" x 4;
    return $tag;
}

sub parse_grid {
    my ($sc) = @_;
    my $d = $sc->u32("num_dimensions");
    die "InvalidField: num_dimensions = $d\n" if $d < 1;
    my $lo = $sc->f64s($d, "domain_lo");
    my $hi = $sc->f64s($d, "domain_hi");
    for my $i (0 .. $d - 1) {
        die "InvalidField: domain[$i] empty/inverted\n"
            unless $lo->[$i] < $hi->[$i];
    }
    my $nn = $sc->u32s($d, "n_nodes");
    my $total = 1;
    for my $i (0 .. $d - 1) {
        die "InvalidField: n_nodes[$i] = $nn->[$i]\n" if $nn->[$i] < 1;
        $total *= $nn->[$i];
        die "InvalidField: tensor too large\n" if $total > MAX_TOTAL;
    }
    return ($d, $lo, $hi, $nn, $total);
}

sub make_approx {
    my ($d, $lo, $hi, $nn, $vals) = @_;
    my (@nodes, @weights);
    for my $i (0 .. $d - 1) {
        my $nd = chebyshev_nodes($lo->[$i], $hi->[$i], $nn->[$i]);
        push @nodes, $nd;
        push @weights, barycentric_weights($nd);
    }
    return { kind => "Approximation", d => $d, lo => $lo, hi => $hi,
             n => $nn, values => $vals, nodes => \@nodes,
             weights => \@weights };
}

sub parse_approx {
    my ($sc) = @_;
    my ($d, $lo, $hi, $nn, $total) = parse_grid($sc);
    my $vals = $sc->f64s($total, "tensor_values");
    return make_approx($d, $lo, $hi, $nn, $vals);
}

sub parse_spline {
    my ($sc) = @_;
    my ($d, $lo, $hi, $nn, $per_piece) = parse_grid($sc);
    my $kc = $sc->u32s($d, "num_knots");
    my @knots;
    for my $i (0 .. $d - 1) {
        my $k = $sc->f64s($kc->[$i], "knots dim $i");
        for my $j (1 .. $#$k) {
            die "InvalidField: knots dim $i not ascending\n"
                unless $k->[$j - 1] < $k->[$j];
        }
        for my $kn (@$k) {
            die "InvalidField: knots dim $i not strictly inside domain\n"
                unless $lo->[$i] < $kn && $kn < $hi->[$i];
        }
        push @knots, $k;
    }
    my $num_pieces = $sc->u32("num_pieces");
    my $expect = 1;
    $expect *= $_ + 1 for @$kc;
    die "InvalidField: num_pieces $num_pieces != $expect\n"
        unless $num_pieces == $expect;

    # Per-dim cell bounds: [lo, knots..., hi]; piece (i_0..i_{d-1})
    # (C-order) is a full interpolant on its own cell product.
    my @bounds = map { [$lo->[$_], @{$knots[$_]}, $hi->[$_]] } 0 .. $d - 1;
    my @shape = map { scalar(@{$knots[$_]}) + 1 } 0 .. $d - 1;
    my @pieces;
    for my $flat (0 .. $num_pieces - 1) {
        my (@cell, $rem);
        $rem = $flat;
        for (my $i = $d - 1; $i >= 0; $i--) {
            unshift @cell, $rem % $shape[$i];
            $rem = int($rem / $shape[$i]);
        }
        my $vals = $sc->f64s($per_piece, "piece $flat");
        push @pieces, make_approx(
            $d,
            [map { $bounds[$_][$cell[$_]] } 0 .. $d - 1],
            [map { $bounds[$_][$cell[$_] + 1] } 0 .. $d - 1],
            $nn, $vals);
    }
    return { kind => "Spline", d => $d, lo => $lo, hi => $hi, n => $nn,
             knots => \@knots, shape => \@shape, pieces => \@pieces };
}

sub read_pcb {
    my ($path) = @_;
    open my $fh, "<:raw", $path or die "Io: cannot open $path: $!\n";
    local $/;
    my $data = <$fh>;
    close $fh;
    my $sc = Scanner->new($data);
    my $tag = parse_header($sc);
    my $obj = $tag == TAG_APPROX ? parse_approx($sc)
            : $tag == TAG_SPLINE ? parse_spline($sc)
            : die "UnknownClassTag: $tag\n";
    die "InvalidField: trailing bytes\n"
        unless $sc->{pos} == length $data;
    return $obj;
}

sub evaluate {
    my ($obj, $point) = @_;
    if ($obj->{kind} eq "Spline") {
        my $flat = 0;
        for my $i (0 .. $obj->{d} - 1) {
            my $k = $obj->{knots}[$i];
            my $idx = 0;
            $idx++ while $idx < @$k && $point->[$i] >= $k->[$idx];
            $flat = $flat * $obj->{shape}[$i] + $idx;
        }
        $obj = $obj->{pieces}[$flat];
    }
    return collapse($obj->{values}, $obj->{n}, $obj->{nodes},
                    $obj->{weights}, $point);
}

# ---- CLI --------------------------------------------------------------------

if (!caller) {
    if (@ARGV < 1) {
        print STDERR "usage: pcbreader.pl model.pcb [x1 ... xd]\n";
        exit 2;
    }
    my $obj = eval { read_pcb($ARGV[0]) };
    if (!$obj) { print STDERR "error: $@"; exit 1 }
    if (@ARGV == 1) {
        printf "%s: d=%d, n_nodes=[%s]\n",
            $obj->{kind}, $obj->{d}, join(", ", @{$obj->{n}});
        exit 0;
    }
    my @coords = map { 0 + $_ } @ARGV[1 .. $#ARGV];
    if (@coords != $obj->{d}) {
        printf STDERR "error: file is %d-D but %d coords given\n",
            $obj->{d}, scalar @coords;
        exit 1;
    }
    printf "%.17g\n", evaluate($obj, \@coords);
}

1;
