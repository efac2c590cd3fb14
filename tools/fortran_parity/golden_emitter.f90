! Golden emitter for tests/test_fortran_parity.py: runs the REFERENCE
! Fortran implementation (m_interp_unstructured.f90) on deterministic
! inputs and writes raw float64 result streams that the pytest side
! compares against this repo's JAX implementation at 1e-12.
!
! Usage:
!   golden_emitter interp <mesh.binda> <queries.f64raw> <n> <out.f64raw>
!       Cold-start scalar interpolation of point data 'Polynomial' at n
!       query points (the test_triangle.f90:23 oracle protocol, but on
!       shared deterministic queries instead of random ones).  Queries
!       are a raw stream of n xyz float64 triples; output is a raw
!       stream of n float64 values (-huge marks a silent miss,
!       m_interp_unstructured.f90:492).
!   golden_emitter trace <triangle.binda> <out.f64raw>
!       The test_trace_field.f90:17-64 scenario: circular field
!       (vx, vy) = (-y, x), RK23 trace from (1.5, 0) with one extra ODE
!       variable (arc length, start value -0.75*pi).  Output: n_steps
!       as one float64, then y(ndim+nvar, n_steps), then
!       y_field(ndim, n_steps), all column-major raw float64.
program golden_emitter
  use iso_fortran_env, only: error_unit
  use m_interp_unstructured

  implicit none
  integer, parameter :: dp = kind(0.0d0)
  character(len=1024) :: mode, mesh_file, in_file, out_file, arg_n
  integer :: nq

  call get_command_argument(1, mode)
  select case (trim(mode))
  case ("interp")
     call get_command_argument(2, mesh_file)
     call get_command_argument(3, in_file)
     call get_command_argument(4, arg_n)
     call get_command_argument(5, out_file)
     read(arg_n, *) nq
     call emit_interp(trim(mesh_file), trim(in_file), nq, trim(out_file))
  case ("trace")
     call get_command_argument(2, mesh_file)
     call get_command_argument(3, out_file)
     call emit_trace(trim(mesh_file), trim(out_file))
  case default
     write(error_unit, *) "usage: golden_emitter interp <mesh.binda>" // &
          " <queries.f64raw> <n> <out.f64raw> | trace <mesh.binda>" // &
          " <out.f64raw>"
     error stop "bad arguments"
  end select

contains

  subroutine emit_interp(mesh_file, in_file, nq, out_file)
    character(len=*), intent(in) :: mesh_file, in_file, out_file
    integer, intent(in)          :: nq
    type(iu_grid_t)              :: ug
    real(dp), allocatable        :: r(:, :), res(:)
    integer, allocatable         :: ic(:)
    integer                      :: n, ivar, unit_in, unit_out

    call iu_read_grid(mesh_file, ug)
    call iu_get_point_data_index(ug, 'Polynomial', ivar)
    if (ivar == -1) error stop "Point data 'Polynomial' not found"

    allocate(r(3, nq), res(nq), ic(nq))
    open(newunit=unit_in, file=in_file, access='stream', &
         form='unformatted', status='old')
    read(unit_in) r
    close(unit_in)

    ic(:) = 0                     ! all cold (kd-tree seeded)
    res(:) = -huge(1.0_dp)        ! silent-miss sentinel (:492)
    do n = 1, nq
       call iu_interpolate_scalar_at(ug, r(:, n), ivar, res(n), ic(n))
    end do

    open(newunit=unit_out, file=out_file, access='stream', &
         form='unformatted', status='replace')
    write(unit_out) res
    close(unit_out)
    print *, "interp goldens written: ", trim(out_file)
  end subroutine emit_interp

  subroutine emit_trace(mesh_file, out_file)
    character(len=*), intent(in) :: mesh_file, out_file
    type(iu_grid_t)              :: ug
    integer, parameter           :: ndim = 2, nvar = 1, max_steps = 100
    real(dp)                     :: y(ndim+nvar, max_steps)
    real(dp)                     :: y_field(ndim, max_steps)
    integer                      :: n, n_steps, i_vx, i_vy, unit_out

    call iu_read_grid(mesh_file, ug)
    call iu_add_point_data(ug, 'vx', i_vx)
    call iu_add_point_data(ug, 'vy', i_vy)
    do n = 1, ug%n_points
       ug%point_data(n, i_vx) = -ug%points(2, n)
       ug%point_data(n, i_vy) = ug%points(1, n)
    end do

    y = 0.0_dp
    y_field = 0.0_dp
    y(1:ndim, 1) = [1.500_dp, 0.0_dp]
    y(ndim+1, 1) = -0.75_dp * acos(-1.0_dp)

    call iu_integrate_along_field(ug, ndim, nvar, sub_int, &
         [i_vx, i_vy], 1e-5_dp, 1.0e-1_dp, max_steps, 1e-3_dp, &
         1e-3_dp, .false., y, y_field, n_steps, .false.)

    if (n_steps > max_steps) error stop "Boundary not reached"

    open(newunit=unit_out, file=out_file, access='stream', &
         form='unformatted', status='replace')
    write(unit_out) real(n_steps, dp)
    write(unit_out) y(:, 1:n_steps)
    write(unit_out) y_field(:, 1:n_steps)
    close(unit_out)
    print *, "trace goldens written: ", trim(out_file), &
         "  n_steps:", n_steps
  end subroutine emit_trace

  subroutine sub_int(ndim, nvar, field, y, dy_var)
    integer, intent(in)   :: ndim
    integer, intent(in)   :: nvar
    real(dp), intent(in)  :: field(ndim)
    real(dp), intent(in)  :: y(ndim+nvar)
    real(dp), intent(out) :: dy_var(nvar)
    dy_var(:) = 1.0_dp
  end subroutine sub_int

end program golden_emitter
