! Cart-pole demo app in Fortran against the native Communicator.
! Reference analog: apps/cart_pole_f90/cart-pole.f90 + include/smarties.f90
! (same MDP as the C++/python demos: hidden angle dim, bounded force,
! 500-step truncation); own implementation (RK4 integrator).
!
! Build (needs gfortran; absent from the dev image, provided for users):
!   make -C ../../native all
!   gfortran -o cart_pole cart_pole.f90 ../../native/smarties_tpu.f90 \
!     -L../../native/build -lsmarties_tpu_comm
! Run via the python learner (see apps/cart_pole_cpp/ for the pattern):
!   SMARTIES_TPU_SOCKET=<path> ./cart_pole
program cart_pole_app
  use smarties_tpu
  use iso_c_binding
  implicit none

  integer, parameter :: STATE_DIM = 6, ACT_DIM = 1, OBS_DIM = 6
  real(c_double), parameter :: dt = 2.0d-2, mp = 1.0d-1, mc = 1.0d0, &
      l = 5.0d-1, g = 9.81d0
  type(c_ptr) :: comm
  real(c_double) :: u(4), state(STATE_DIM), action(ACT_DIM)
  real(c_double) :: upper(ACT_DIM), lower(ACT_DIM), reward, f
  integer(c_int) :: observable(STATE_DIM)
  integer :: step_id, status
  character(len=256) :: sock
  character(kind=c_char, len=257) :: csock

  call get_environment_variable('SMARTIES_TPU_SOCKET', sock)
  csock = trim(sock) // c_null_char
  comm = smarties_tpu_create(csock)

  call smarties_tpu_set_state_action_dims(comm, STATE_DIM, ACT_DIM)
  upper(1) = 10.0d0
  lower(1) = -10.0d0
  call smarties_tpu_set_action_scales(comm, upper, lower, 1, ACT_DIM)
  ! state [x, v, angle, avel, cos(a), sin(a)]; raw angle hidden
  ! (same layout as apps/cart_pole_cpp/cart_pole.cpp)
  observable = (/ 1, 1, 0, 1, 1, 1 /)
  call smarties_tpu_set_state_observable(comm, observable, STATE_DIM)

  do
    call reset_env(u, step_id)
    call get_state(u, state)
    call smarties_tpu_send_init_state(comm, state, STATE_DIM, 0)
    do
      status = smarties_tpu_recv_action(comm, action, ACT_DIM, 0)
      if (status /= 0) stop 0      ! KILL from the learner
      f = action(1)
      call advance(u, f)
      step_id = step_id + 1
      call get_state(u, state)
      reward = merge(0.0d0, 1.0d0, failed(u))
      if (failed(u)) then
        call smarties_tpu_send_term_state(comm, state, STATE_DIM, &
                                          reward, 0)
        exit
      else if (step_id >= 500) then
        call smarties_tpu_send_last_state(comm, state, STATE_DIM, &
                                          reward, 0)
        exit
      else
        call smarties_tpu_send_state(comm, state, STATE_DIM, reward, 0)
      end if
    end do
  end do

contains

  subroutine reset_env(u, step_id)
    real(c_double), intent(out) :: u(4)
    integer, intent(out) :: step_id
    integer :: i
    real(c_double) :: r
    do i = 1, 4
      call random_number(r)
      u(i) = 1.0d-1 * (r - 0.5d0)
    end do
    step_id = 0
  end subroutine

  logical function failed(u)
    real(c_double), intent(in) :: u(4)
    failed = abs(u(1)) > 2.4d0 .or. abs(u(3)) > acos(-1.0d0) / 15.0d0
  end function

  subroutine deriv(y, f, dy)
    real(c_double), intent(in) :: y(4), f
    real(c_double), intent(out) :: dy(4)
    real(c_double) :: cosy, siny, tot, fac, aacc
    cosy = cos(y(3)); siny = sin(y(3))
    tot = mc + mp
    fac = (f + mp * l * y(4)**2 * siny) / tot
    aacc = (g * siny - cosy * fac) / &
           (l * (4.0d0 / 3.0d0 - mp * cosy**2 / tot))
    dy(1) = y(2)
    dy(2) = fac - mp * l * aacc * cosy / tot
    dy(3) = y(4)
    dy(4) = aacc
  end subroutine

  subroutine advance(u, f)
    real(c_double), intent(inout) :: u(4)
    real(c_double), intent(in) :: f
    real(c_double) :: k1(4), k2(4), k3(4), k4(4), tmp(4)
    call deriv(u, f, k1)
    tmp = u + 0.5d0 * dt * k1
    call deriv(tmp, f, k2)
    tmp = u + 0.5d0 * dt * k2
    call deriv(tmp, f, k3)
    tmp = u + dt * k3
    call deriv(tmp, f, k4)
    u = u + dt / 6.0d0 * (k1 + 2.0d0 * k2 + 2.0d0 * k3 + k4)
  end subroutine

  subroutine get_state(u, state)
    real(c_double), intent(in) :: u(4)
    real(c_double), intent(out) :: state(STATE_DIM)
    state(1) = u(1)                 ! x
    state(2) = u(2)                 ! v
    state(3) = u(3)                 ! raw angle (hidden from the learner)
    state(4) = u(4)                 ! angular velocity
    state(5) = cos(u(3))
    state(6) = sin(u(3))
  end subroutine

end program cart_pole_app
